"""Native (C++) windowed-batch loader: ctypes bindings + binary-cache
conversion + Python iterator facade.

Division of labor:
* Python converts each HDF5 simulation once into a flat mmap-able binary
  cache (``.cgnn`` file; see csrc/window_loader.cpp for the layout);
* the C++ library mmaps the caches and assembles training batches with
  multithreaded memcpy plus a background prefetch thread, so batch i+1 is
  built while the device executes step i — replacing the reference's
  Python/h5py slicing in the hot loop (``dataloader.py:102-131``).

Cache format v2 stores EVERY ndim>0 field of the HDF5 schema (Coordinates,
InternalEnergy, Velocities, HydroAcceleration, ... — the reference serves
all of them, ``dataloader.py:42-51``); the classic 4-array batch contract
reads fields 0/1 (Coordinates/InternalEnergy), ``include_extras=True``
mirrors ``SequenceDataset.batches``'s ``extra_inputs``/``extra_targets``.

Falls back cleanly: ``is_available()`` is False when no compiler exists, and
``SequenceDataset`` (pure numpy) remains the default path.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_MAGIC_V2 = 0x43474E4E53494D32
_CORE_FIELDS = ("Coordinates", "InternalEnergy")
_LIB = None
_LIB_ERR: Optional[str] = None
_F32P = ctypes.POINTER(ctypes.c_float)


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "csrc",
        "window_loader.cpp",
    )


def _build_library() -> str:
    """Compile csrc/window_loader.cpp to a shared library (cached)."""
    src = _source_path()
    cache_dir = os.path.join(
        tempfile.gettempdir(), "cgnn_native", str(os.getuid())
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libwindow_loader.so")
    if (
        os.path.exists(lib_path)
        and os.path.getmtime(lib_path) >= os.path.getmtime(src)
    ):
        return lib_path
    # Build to a unique temp name and atomically move into place so
    # concurrent processes never observe (or write) a half-built library.
    tmp_path = f"{lib_path}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        src, "-o", tmp_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp_path, lib_path)
    return lib_path


def _load_library():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    try:
        lib = ctypes.CDLL(_build_library())
    except Exception as exc:  # no compiler / build failure
        _LIB_ERR = str(exc)
        return None
    lib.wl_open.restype = ctypes.c_void_p
    lib.wl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    for name in ("wl_num_sequences", "wl_num_particles", "wl_num_snapshots"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.wl_box_size.restype = ctypes.c_double
    lib.wl_box_size.argtypes = [ctypes.c_void_p]
    lib.wl_dt.restype = ctypes.c_double
    lib.wl_dt.argtypes = [ctypes.c_void_p]
    lib.wl_num_fields.restype = ctypes.c_int
    lib.wl_num_fields.argtypes = [ctypes.c_void_p]
    lib.wl_field_dim.restype = ctypes.c_int64
    lib.wl_field_dim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wl_field_name.restype = ctypes.c_int
    lib.wl_field_name.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.wl_get_batch_fields.restype = None
    lib.wl_get_batch_fields.argtypes = [
        ctypes.c_void_p, i64p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(_F32P), ctypes.POINTER(_F32P),
    ]
    lib.wl_close.restype = None
    lib.wl_close.argtypes = [ctypes.c_void_p]
    lib.wl_prefetch_start_fields.restype = ctypes.c_void_p
    lib.wl_prefetch_start_fields.argtypes = [
        ctypes.c_void_p, i64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.wl_prefetch_next_fields.restype = ctypes.c_int
    lib.wl_prefetch_next_fields.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_F32P), ctypes.POINTER(_F32P),
    ]
    lib.wl_prefetch_stop.restype = None
    lib.wl_prefetch_stop.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load_library() is not None


def convert_hdf5_to_cache(hdf5_path: str, cache_path: str) -> str:
    """One-time conversion of a reference-schema HDF5 file into the flat
    binary cache (v2) the native loader mmaps.

    Stores every ndim>0 field ([T, N] fields expanded to [T, N, 1] like the
    reference, ``dataloader.py:125-129``), Coordinates and InternalEnergy
    first. Written atomically (temp file + os.replace) so an interrupted
    conversion never leaves a newer-than-source truncated cache behind."""
    from cosmology_gnn_simulation_tpu.data.hdf5 import read_simulation

    sim = read_simulation(hdf5_path)
    arrays: List[np.ndarray] = []
    names: List[str] = []
    extra = sorted(
        name
        for name, arr in sim.items()
        if getattr(arr, "ndim", 0) > 0 and name not in _CORE_FIELDS
    )
    for name in (*_CORE_FIELDS, *extra):
        if name not in sim:
            raise ValueError(f"{hdf5_path} lacks required field {name}")
        arr = np.asarray(sim[name], dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.ndim != 3:
            raise ValueError(f"{name}: expected [T, N(, d)], got {arr.shape}")
        arrays.append(np.ascontiguousarray(arr))
        names.append(name)
    t, n = arrays[0].shape[:2]
    tmp_path = cache_path + f".tmp.{os.getpid()}"
    with open(tmp_path, "wb") as f:
        f.write(struct.pack("<qqqdd", _MAGIC_V2, t, n,
                            float(sim["BoxSize"]), float(sim["TimeStep"])))
        f.write(struct.pack("<q", len(names)))
        for name, arr in zip(names, arrays):
            encoded = name.encode()
            f.write(struct.pack("<q", len(encoded)))
            f.write(encoded)
            f.write(struct.pack("<q", arr.shape[2]))
        for arr in arrays:
            f.write(arr.tobytes())
    os.replace(tmp_path, cache_path)
    return cache_path


def _ptr_array(arrays: Sequence[np.ndarray]):
    return (_F32P * len(arrays))(
        *[a.ctypes.data_as(_F32P) for a in arrays]
    )


class NativeSequenceLoader:
    """Drop-in batch source backed by the C++ loader.

    ``batches()`` mirrors ``SequenceDataset.batches`` (same dict-of-arrays
    contract, incl. ``include_extras``) but assembles batches in native
    threads with background prefetch.
    """

    def __init__(
        self,
        cache_paths: Sequence[str],
        window_size: int,
        num_threads: int = 4,
    ):
        lib = _load_library()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_LIB_ERR}")
        self._lib = lib
        arr = (ctypes.c_char_p * len(cache_paths))(
            *[p.encode() for p in cache_paths]
        )
        self._handle = lib.wl_open(arr, len(cache_paths), window_size,
                                   num_threads)
        if not self._handle:
            raise ValueError(
                f"failed to open caches (bad magic/shape mismatch): "
                f"{list(cache_paths)}"
            )
        self.window_size = window_size
        self.num_particles = int(lib.wl_num_particles(self._handle))
        self.num_snapshots = int(lib.wl_num_snapshots(self._handle))
        self.box_size = float(lib.wl_box_size(self._handle))
        self.dt = float(lib.wl_dt(self._handle))
        self.field_names: List[str] = []
        self.field_dims: List[int] = []
        buf = ctypes.create_string_buffer(256)
        for i in range(int(lib.wl_num_fields(self._handle))):
            lib.wl_field_name(self._handle, i, buf, 256)
            self.field_names.append(buf.value.decode())
            self.field_dims.append(int(lib.wl_field_dim(self._handle, i)))
        if tuple(self.field_names[:2]) != _CORE_FIELDS:
            raise ValueError(
                f"cache field order {self.field_names[:2]} != {_CORE_FIELDS}"
            )

    def __len__(self) -> int:
        return int(self._lib.wl_num_sequences(self._handle))

    def _alloc(self, batch_size: int, num_fields: int):
        """Allocate (wins, tgts) arrays for the leading ``num_fields``."""
        w, n = self.window_size, self.num_particles
        wins = [
            np.empty((batch_size, w, n, d), np.float32)
            for d in self.field_dims[:num_fields]
        ]
        tgts = [
            np.empty((batch_size, n, d), np.float32)
            for d in self.field_dims[:num_fields]
        ]
        return wins, tgts

    def _pack(self, wins, tgts) -> Dict[str, np.ndarray]:
        batch = {
            "positions": wins[0],
            "temperatures": wins[1],
            "target_positions": tgts[0],
            "target_temperatures": tgts[1],
        }
        if len(wins) > 2:
            batch["extra_inputs"] = dict(
                zip(self.field_names[2:], wins[2:])
            )
            batch["extra_targets"] = dict(
                zip(self.field_names[2:], tgts[2:])
            )
        return batch

    def get_batch(
        self, seq_indices: Sequence[int], *, include_extras: bool = False
    ) -> Dict[str, np.ndarray]:
        nf = len(self.field_names) if include_extras else 2
        seqs = np.asarray(seq_indices, dtype=np.int64)
        wins, tgts = self._alloc(len(seqs), nf)
        self._lib.wl_get_batch_fields(
            self._handle, seqs, len(seqs), nf,
            _ptr_array(wins), _ptr_array(tgts),
        )
        return self._pack(wins, tgts)

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        prefetch_depth: int = 2,
        include_extras: bool = False,
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self), dtype=np.int64)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        num_full = (len(order) // batch_size) * batch_size
        nf = len(self.field_names) if include_extras else 2
        pf = self._lib.wl_prefetch_start_fields(
            self._handle, order[:num_full], num_full, batch_size,
            prefetch_depth, nf,
        )
        if not pf:
            # wl_prefetch_start_fields returns NULL on invalid arguments
            # (e.g. nf out of range); passing that to wl_prefetch_next_fields
            # would be a NULL deref in the C++ layer.
            raise RuntimeError(
                f"native prefetcher failed to start (fields={nf}, "
                f"batch_size={batch_size}) — cache/loader invariant violated"
            )
        try:
            while True:
                wins, tgts = self._alloc(batch_size, nf)
                ok = self._lib.wl_prefetch_next_fields(
                    pf, _ptr_array(wins), _ptr_array(tgts)
                )
                if not ok:
                    break
                yield self._pack(wins, tgts)
        finally:
            self._lib.wl_prefetch_stop(pf)
        if not drop_remainder and num_full < len(order):
            # Tail batch assembled synchronously (same contract as
            # SequenceDataset.batches(drop_remainder=False)).
            yield self.get_batch(
                order[num_full:].tolist(), include_extras=include_extras
            )

    def close(self):
        if self._handle:
            self._lib.wl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_directory(
    path: str, window_size: int, *, cache_dir: Optional[str] = None
) -> NativeSequenceLoader:
    """Convert all HDF5 files under ``path`` to binary caches (if stale) and
    open a native loader over them."""
    from glob import glob

    files = sorted(glob(os.path.join(path, "*.hdf5"))) or sorted(
        glob(os.path.join(path, "*.h5"))
    )
    if not files:
        raise FileNotFoundError(f"No HDF5 files found in {path}")
    cache_dir = cache_dir or os.path.join(path, ".cgnn_cache")
    os.makedirs(cache_dir, exist_ok=True)
    caches: List[str] = []
    for f in files:
        cache = os.path.join(
            cache_dir, os.path.splitext(os.path.basename(f))[0] + ".cgnn"
        )
        if not os.path.exists(cache) or os.path.getmtime(
            cache
        ) < os.path.getmtime(f):
            convert_hdf5_to_cache(f, cache)
        caches.append(cache)
    return NativeSequenceLoader(caches, window_size)
