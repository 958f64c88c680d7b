"""Device kernels for the TPU k-mer engine.

Modules (imported lazily by the engine; import directly as needed):

- ``encoding``  — 4-bit IUPAC / 2-bit ACGT rank encodings, complement tables
- ``keys``      — packed key-word construction, segment math, caps
- ``sort``      — single-chip sorts (one-window, iterative refinement,
                  shape bucketing) and adjacent-boundary masks
- ``groups``    — segmented group geometry, histograms, selection masks
- ``filters``   — vectorized filter masks + scalar parity fallbacks
- ``canonical`` — strand-collapsed (min(kmer, revcomp)) keys and sorting
- ``query``     — binary-search streaming count queries
- ``hybrid``    — sparse-ambiguity 2-bit/4-bit split sort (opt-in)
- ``pallas_kernels`` — hand-written TPU kernels (2-bit pack)
"""
