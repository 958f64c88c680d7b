#!/usr/bin/env python
"""Regenerate the docs figures from the committed profiling CSVs.

Counterpart of the reference's docs/resources/*.png profiling figures
(/root/reference/docs/development.rst:100-253 embeds them); ours are
regenerated from docs/profiling_results/*.csv so the narrative in
docs/development.md is reproducible:

    python tools/make_figures.py          # writes docs/resources/*.png

Optional input (written by ``tools/run_scaling_sweep.py`` on a TPU):
docs/profiling_results/v5e-sort-scaling.csv with columns
``num_kmers,kmers_per_s`` for the device-pipeline scaling figure.
"""

import csv
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
CSV_DIR = os.path.join(HERE, "..", "docs", "profiling_results")
OUT_DIR = os.path.join(HERE, "..", "docs", "resources")

# categorical slots 1-3 of the validated default palette (fixed order)
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def _read(name):
    with open(os.path.join(CSV_DIR, name), newline="") as f:
        return list(csv.DictReader(f))


def _style(ax, title, xlabel, ylabel):
    ax.set_facecolor(SURFACE)
    ax.figure.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color("#d8d7d2")
    ax.grid(True, color="#e8e7e2", linewidth=0.8)
    ax.set_axisbelow(True)
    ax.tick_params(colors=INK2, labelsize=9)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=12)
    ax.set_xlabel(xlabel, color=INK2, fontsize=9)
    ax.set_ylabel(ylabel, color=INK2, fontsize=9)


def fig_sort_scaling():
    """Device sort throughput vs working-set size (single v5e chip)."""
    path = os.path.join(CSV_DIR, "v5e-sort-scaling.csv")
    if not os.path.exists(path):
        print("skip sort-scaling figure (no v5e-sort-scaling.csv yet)")
        return
    rows = _read("v5e-sort-scaling.csv")
    n = [int(r["num_kmers"]) for r in rows]
    tput = [float(r["kmers_per_s"]) / 1e6 for r in rows]

    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    ax.plot(n, tput, color=BLUE, linewidth=2, marker="o", markersize=5)
    ax.set_xscale("log", base=2)
    _style(
        ax,
        "k=31 sort throughput vs working-set size — one v5e chip",
        "k-mers sorted (log scale)",
        "M k-mers / s",
    )
    # direct-label the sweet spot and the large-N cliff (selective, not every point)
    i_max = tput.index(max(tput))
    ax.annotate(
        f"{tput[i_max]:.1f} M/s",
        (n[i_max], tput[i_max]),
        textcoords="offset points",
        xytext=(0, 8),
        ha="center",
        color=INK,
        fontsize=9,
    )
    ax.annotate(
        f"{tput[-1]:.1f} M/s",
        (n[-1], tput[-1]),
        textcoords="offset points",
        xytext=(-4, 8),
        ha="right",
        color=INK,
        fontsize=9,
    )
    ax.set_ylim(bottom=0)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT_DIR, "sort_scaling.png"))
    plt.close(fig)
    print("wrote docs/resources/sort_scaling.png")


def fig_ingest():
    """Ingest throughput at 1e8 bp: this framework vs the reference's
    published v0.1.0 numbers (/root/reference/docs/development.rst:190-252)."""
    seq = {r["strands_to_load"]: r for r in _read("v5e-large-seq_list_init.csv") if r["seq_len"] == "100000000"}
    fasta = [r for r in _read("v5e-large-fasta_init.csv") if r["seq_len"] == "100000000"][0]
    bp = 1e8
    ours = [
        bp / float(seq["forward"]["min_run_time"]) / 1e6,
        bp / float(seq["reverse_complement"]["min_run_time"]) / 1e6,
        bp / float(seq["both"]["min_run_time"]) / 1e6,
        bp / float(fasta["min_run_time"]) / 1e6,
    ]
    # reference-published avg_run_time at 1e8 bp (development.rst:190,199,208,252)
    ref = [bp / 1.52 / 1e6, bp / 1.58 / 1e6, bp / 1.57 / 1e6, bp / 2.45 / 1e6]
    labels = ["seq_list\nforward", "seq_list\nrevcomp", "seq_list\nboth", "FASTA\n10 records"]

    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    x = range(len(labels))
    w = 0.38
    # 2px-equivalent surface gap between adjacent bars via the width split
    ax.bar([i - w / 2 - 0.01 for i in x], ref, w, color=BLUE, label="reference v0.1.0 (published)")
    ax.bar([i + w / 2 + 0.01 for i in x], ours, w, color=ORANGE, label="genome-kmers-tpu")
    _style(ax, "Ingest throughput at 100 Mbp", "", "Mbp / s")
    ax.set_xticks(list(x), labels)
    for i, v in enumerate(ours):
        ax.annotate(f"{v:.0f}", (i + w / 2 + 0.01, v), textcoords="offset points",
                    xytext=(0, 3), ha="center", color=INK, fontsize=8)
    for i, v in enumerate(ref):
        ax.annotate(f"{v:.0f}", (i - w / 2 - 0.01, v), textcoords="offset points",
                    xytext=(0, 3), ha="center", color=INK, fontsize=8)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK2, ncol=2,
              loc="lower right", bbox_to_anchor=(1.0, 1.0), borderaxespad=0)
    ax.set_title("Ingest throughput at 100 Mbp", color=INK, fontsize=11,
                 loc="left", pad=26)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT_DIR, "ingest_throughput.png"))
    plt.close(fig)
    print("wrote docs/resources/ingest_throughput.png")


def fig_unique_vs_k():
    """Fraction of unique k-mers vs k for the E. coli-scale random-free genome
    (tools/run_applications.py output)."""
    rows = _read("ecoli-unique_vs_k.csv")
    k = [int(r["k"]) for r in rows]
    frac = [float(r["frac_unique"]) for r in rows]

    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    ax.plot(k, frac, color=BLUE, linewidth=2, marker="o", markersize=5)
    _style(
        ax,
        "Unique k-mer fraction vs k — E. coli K-12 scale (4.6 Mbp)",
        "k",
        "fraction of k-mers that are unique",
    )
    ax.set_ylim(-0.03, 1.05)
    # the knee is the scientifically interesting point — label it
    for i, kk in enumerate(k):
        if kk in (12, 21):
            ax.annotate(f"{frac[i]:.2f}", (kk, frac[i]), textcoords="offset points",
                        xytext=(6, -10), color=INK, fontsize=9)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT_DIR, "unique_vs_k.png"))
    plt.close(fig)
    print("wrote docs/resources/unique_vs_k.png")


def fig_group_size_dist():
    """k=31 group-size distribution of the planted-repeat chr21-scale genome
    (tools/run_applications.py --app group_size_dist output) — the analog of
    the reference's GRCh38 figure (docs/resources/
    GRCh38.p14-kmer-group-size-dist.png), whose signature is the heavy
    repeat tail on log-log axes."""
    path = os.path.join(CSV_DIR, "v5e-chr21-group_size_dist.csv")
    if not os.path.exists(path):
        print("skip group-size-dist figure (no v5e-chr21-group_size_dist.csv yet)")
        return
    rows = _read("v5e-chr21-group_size_dist.csv")
    size = [int(r["group_size"]) for r in rows]
    count = [int(r["num_groups"]) for r in rows]

    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    ax.scatter(size, count, s=12, color=BLUE, linewidths=0)
    ax.set_xscale("log")
    ax.set_yscale("log")
    _style(
        ax,
        "k=31 group-size distribution — 46 Mbp with planted repeat families",
        "group size (occurrences of a distinct 31-mer, log)",
        "number of groups (log)",
    )
    # selective direct labels: the unique head and the repeat tail
    ax.annotate(
        f"unique: {count[0]:,}",
        (size[0], count[0]),
        textcoords="offset points", xytext=(8, -3), color=INK, fontsize=9,
    )
    i_tail = max(range(len(size)), key=lambda i: size[i])
    ax.annotate(
        "repeat families",
        (size[i_tail], count[i_tail]),
        textcoords="offset points", xytext=(-8, 8), ha="right",
        color=INK, fontsize=9,
    )
    fig.tight_layout()
    fig.savefig(os.path.join(OUT_DIR, "group_size_dist.png"))
    plt.close(fig)
    print("wrote docs/resources/group_size_dist.png")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    fig_sort_scaling()
    fig_ingest()
    fig_unique_vs_k()
    fig_group_size_dist()


if __name__ == "__main__":
    main()
