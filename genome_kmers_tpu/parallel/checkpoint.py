"""Sharded checkpointing of device-resident k-mer indexes — the TPU-scale
counterpart of the reference's HDF5/shelve persistence (SURVEY.md §5.4).

The reference serializes everything through host memory
(sequence_collection.py:1293-1446, kmers.py:1306-1531); that stays the
compatibility path. At multi-host scale the sorted position array lives
sharded across the mesh, so checkpoints go through orbax (tensorstore under
the hood): every host writes its own shards in parallel and restore places
shards directly onto the target mesh without a host gather.

Schema: a pytree {"sorted_positions", "packed_genome"(optional)} plus a JSON
metadata blob (kmer params, strand, flags) — the same logical content as the
reference's HDF5 "kmers" group.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .distributed import AXIS, Mesh, mesh_pspec

_META_NAME = "gkt_meta.json"


def save_sharded_index(
    path,
    sorted_positions: jax.Array,
    meta: dict,
    packed_genome: jax.Array | None = None,
) -> None:
    """Write a (possibly sharded) sorted index + metadata to ``path``.

    Works for single-device and mesh-sharded arrays alike — orbax records
    the sharding and writes each shard from its owning host.
    """
    import orbax.checkpoint as ocp

    import jax.numpy as jnp

    path = Path(path).absolute()
    n_real = int(sorted_positions.shape[0])
    # pad to a generous multiple so any mesh size up to 1024 devices can
    # restore the array sharded (uneven splits are not shardable)
    mult = 1024
    n_pad = max(-(-n_real // mult) * mult, mult)
    if n_pad != n_real:
        # under jit so the pad constant is traced (an eager concatenate with a
        # process-local jnp.full would fail on multi-host sharded inputs)
        sorted_positions = jax.jit(
            lambda a: jnp.concatenate(
                [a, jnp.full((n_pad - n_real,), 0xFFFFFFF0, dtype=a.dtype)]
            )
        )(sorted_positions)
    tree = {"sorted_positions": sorted_positions}
    if packed_genome is not None:
        tree["packed_genome"] = packed_genome
    meta = dict(meta)
    meta["__n_real__"] = n_real
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "arrays", tree, force=True)
    meta["__arrays__"] = {
        name: {"shape": list(a.shape), "dtype": str(a.dtype)} for name, a in tree.items()
    }
    # one writer + a barrier: in a multi-process run every process calls
    # save(), and concurrent write_text of the same file races with readers
    if jax.process_index() == 0:
        (path / _META_NAME).write_text(json.dumps(meta))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gkt_ckpt_meta_written")


def load_sharded_index(path, mesh: Mesh | None = None):
    """Restore (sorted_positions, packed_genome_or_None, meta).

    With ``mesh``, the position array is restored sharded along the k-mer
    axis and the genome replicated; without, everything restores to the
    default device layout.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    meta = json.loads((path / _META_NAME).read_text())
    arrays_info = meta.pop("__arrays__", {"sorted_positions": None})

    with ocp.StandardCheckpointer() as ckptr:
        if mesh is not None:
            target = {}
            for name, info in arrays_info.items():
                spec = mesh_pspec(mesh) if name == "sorted_positions" else P()
                target[name] = jax.ShapeDtypeStruct(
                    tuple(info["shape"]),
                    np.dtype(info["dtype"]),
                    sharding=NamedSharding(mesh, spec),
                )
            tree = ckptr.restore(path / "arrays", target)
        else:
            tree = ckptr.restore(path / "arrays")

    meta["__n_real__"] = meta.get("__n_real__", tree["sorted_positions"].shape[0])
    return tree["sorted_positions"], tree.get("packed_genome"), meta


def save_large_kmers(lk, path) -> None:
    """Checkpoint a sorted LargeKmers layout: the (hi, lo) pair-lane sorted
    positions + pad flags, sharded, plus metadata. The genome pack and
    segment tables are constructor inputs and are not written (at >2^32
    scale the strided pack alone is gigabytes; rebuilding it from the FASTA
    is the cheaper, more portable path)."""
    import orbax.checkpoint as ocp

    import jax
    import jax.numpy as jnp

    path = Path(path).absolute()
    (hi, lo), is_pad, mesh, n_real, _lanes = lk._sorted
    n_rows = int(hi.shape[0])
    mult = 1024
    n_pad = max(-(-n_rows // mult) * mult, mult)

    def pad_to(a, fill):
        if n_pad == n_rows:
            return a
        return jax.jit(
            lambda x: jnp.concatenate(
                [x, jnp.full((n_pad - n_rows,), fill, dtype=x.dtype)]
            )
        )(a)

    tree = {
        "pos_hi": pad_to(hi, 0xFFFFFFFF),
        "pos_lo": pad_to(lo, 0xFFFFFFFF),
        "is_pad": pad_to(is_pad, 1),
    }
    meta = {
        "kind": "large_kmers",
        "min_kmer_len": lk.min_kmer_len,
        "max_kmer_len": lk.max_kmer_len,
        "two_bit": lk.two_bit,
        "num_kmers": lk.num_kmers,
        "n_real": int(n_real),
        "custom_positions": bool(lk._custom_positions),
        "__n_real__": n_rows,
        "__arrays__": {
            name: {"shape": list(a.shape), "dtype": str(a.dtype)}
            for name, a in tree.items()
        },
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "arrays", tree, force=True)
    if jax.process_index() == 0:
        (path / _META_NAME).write_text(json.dumps(meta))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gkt_large_ckpt_meta_written")


def load_large_kmers(lk, path, mesh: Mesh) -> dict:
    """Restore a LargeKmers sorted layout onto ``mesh`` (any device count).

    Resharding interleaves old shard-tail pads into the row stream, so a
    stable per-shard (is_pad, hi, lo) compaction restores the ragged
    invariant (valid rows form a prefix per shard) without touching the
    global order of real rows. The retained sorted lanes are NOT persisted;
    statistics after a restore rebuild key words in-kernel
    (sorted_words=None path) — one strided gather per stats call until the
    next in-process sort."""
    import orbax.checkpoint as ocp

    import jax

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from functools import partial as _partial

    path = Path(path).absolute()
    meta = json.loads((path / _META_NAME).read_text())
    if meta.get("kind") != "large_kmers":
        raise ValueError(f"{path} is not a LargeKmers checkpoint")
    if (
        meta["min_kmer_len"] != lk.min_kmer_len
        or meta["max_kmer_len"] != lk.max_kmer_len
        or bool(meta["two_bit"]) != lk.two_bit
        or meta["num_kmers"] != lk.num_kmers
    ):
        raise ValueError(
            "checkpoint parameters do not match this LargeKmers "
            f"(ckpt: min={meta['min_kmer_len']} max={meta['max_kmer_len']} "
            f"two_bit={meta['two_bit']} n={meta['num_kmers']})"
        )
    arrays_info = meta["__arrays__"]
    with ocp.StandardCheckpointer() as ckptr:
        target = {
            name: jax.ShapeDtypeStruct(
                tuple(info["shape"]),
                np.dtype(info["dtype"]),
                sharding=NamedSharding(mesh, mesh_pspec(mesh)),
            )
            for name, info in arrays_info.items()
        }
        tree = ckptr.restore(path / "arrays", target)

    @_partial(jax.jit, static_argnames=("mesh",))
    def compact(hi, lo, pad, mesh):
        def local(h, l, p):
            s_p, s_h, s_l = jax.lax.sort((p, h, l), num_keys=1, is_stable=True)
            return s_h, s_l, s_p

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(mesh_pspec(mesh),) * 3,
            out_specs=(mesh_pspec(mesh),) * 3,
        )
        return fn(hi, lo, pad)

    hi, lo, is_pad = compact(tree["pos_hi"], tree["pos_lo"], tree["is_pad"], mesh)
    lanes = None
    lk._sorted = ((hi, lo), is_pad, mesh, int(meta["n_real"]), lanes)
    lk._is_sorted = True
    lk._custom_positions = bool(meta.get("custom_positions", False))
    return meta


def save_kmers_sharded(kmers, path, include_genome: bool = False) -> None:
    """Checkpoint a sorted Kmers object's device state (EXTENSION).

    Metadata mirrors the reference's HDF5 "kmers" group fields
    (kmers.py:1400-1433) so the logical schema is recognizable.
    """
    if not kmers._is_sorted:
        raise ValueError("save_kmers_sharded requires a sorted index")
    meta = {
        "min_kmer_len": kmers.min_kmer_len,
        "max_kmer_len": kmers.max_kmer_len,
        "kmer_source_strand": kmers.kmer_source_strand,
        "track_strands_separately": kmers.track_strands_separately,
        "_is_initialized": kmers._is_initialized,
        "_is_set": kmers._is_set,
        "_is_sorted": kmers._is_sorted,
        "num_kmers": int(len(kmers)),
    }
    genome = None
    if include_genome:
        genome = kmers._dc().packed
    save_sharded_index(path, kmers._device_positions(), meta, packed_genome=genome)


def load_kmers_sharded(kmers, path, mesh: Mesh | None = None) -> dict:
    """Restore a checkpoint into an initialized Kmers object (EXTENSION).

    The caller provides a Kmers built over the same SequenceCollection
    (matching the reference's external-seq_coll load path, kmers.py:1466-1470);
    metadata is validated against it. Returns the metadata dict.
    """
    sorted_pos, _, meta = load_sharded_index(path, mesh=mesh)
    if meta["min_kmer_len"] != kmers.min_kmer_len or meta["max_kmer_len"] != kmers.max_kmer_len:
        raise ValueError(
            f"checkpoint kmer params (min={meta['min_kmer_len']}, max={meta['max_kmer_len']}) "
            f"do not match this Kmers (min={kmers.min_kmer_len}, max={kmers.max_kmer_len})"
        )
    if meta["num_kmers"] != len(kmers):
        raise ValueError(
            f"checkpoint has {meta['num_kmers']} kmers, this Kmers has {len(kmers)}"
        )
    n_real = int(meta["__n_real__"])
    kmers.kmer_sba_start_indices = np.asarray(sorted_pos)[:n_real]
    kmers._pos_dev = None  # lazily re-uploaded at the trimmed length
    kmers._is_sorted = bool(meta["_is_sorted"])
    return meta
