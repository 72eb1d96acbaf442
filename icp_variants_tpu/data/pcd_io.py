"""PCD (Point Cloud Data) file reader — host side, numpy.

Replaces the PCL ``loadPCDFile`` dependency of the ETH loader
(ETHDataLoader.h:66-89). Supports the v0.7 format in ``ascii``,
``binary`` and (optionally gzip-transparent) files with arbitrary field
layouts; only x/y/z are extracted, like the reference's
``pcl::PointXYZ`` load.

``read_pcd_batch`` parses many files at once through the native threaded
scanner (runtime/native.parse_floats_f32_batch) — the data-loader prefetch
path for batched sweeps, where the reference loads serially through PCL.
"""

from __future__ import annotations

import numpy as np

_DTYPES = {
    ("F", 4): np.float32,
    ("F", 8): np.float64,
    ("I", 1): np.int8,
    ("I", 2): np.int16,
    ("I", 4): np.int32,
    ("U", 1): np.uint8,
    ("U", 2): np.uint16,
    ("U", 4): np.uint32,
}


def _read_header(path: str):
    """Parse a .pcd header; returns ``(header_dict, body_offset)``."""
    with open(path, "rb") as f:
        header = {}
        while True:
            raw = f.readline()
            if not raw:
                raise ValueError(
                    f"{path}: EOF before DATA line (truncated or not a .pcd)"
                )
            line = raw.decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, rest = line.partition(" ")
            header[key.upper()] = rest.split()
            if key.upper() == "DATA":
                break
        return header, f.tell()


def _ascii_xyz(arr: np.ndarray, header) -> np.ndarray:
    fields = [s.lower() for s in header["FIELDS"]]
    counts = [int(s) for s in header.get("COUNT", ["1"] * len(fields))]
    n_points = int(header["POINTS"][0])
    row_len = sum(counts)
    arr = arr[: n_points * row_len].reshape(n_points, row_len)
    cols = {}
    off = 0
    for name, cnt in zip(fields, counts):
        cols[name] = arr[:, off]
        off += cnt
    return np.stack([cols["x"], cols["y"], cols["z"]], axis=1).astype(
        np.float32
    )


def _binary_xyz(body: bytes, header) -> np.ndarray:
    fields = [s.lower() for s in header["FIELDS"]]
    sizes = [int(s) for s in header["SIZE"]]
    types = header["TYPE"]
    counts = [int(s) for s in header.get("COUNT", ["1"] * len(fields))]
    n_points = int(header["POINTS"][0])
    dtype_fields = []
    for name, size, typ, cnt in zip(fields, sizes, types, counts):
        base = _DTYPES[(typ, size)]
        if cnt == 1:
            dtype_fields.append((name, base))
        else:
            dtype_fields.append((name, base, (cnt,)))
    dt = np.dtype(dtype_fields)
    arr = np.frombuffer(body, dtype=dt, count=n_points)
    return np.stack(
        [
            arr["x"].astype(np.float32),
            arr["y"].astype(np.float32),
            arr["z"].astype(np.float32),
        ],
        axis=1,
    )


def _ascii_count(header) -> int:
    fields = [s.lower() for s in header["FIELDS"]]
    counts = [int(s) for s in header.get("COUNT", ["1"] * len(fields))]
    return int(header["POINTS"][0]) * sum(counts)


def _read_ascii_fallback(path: str, body_offset: int) -> np.ndarray:
    with open(path, "rb") as f:
        f.seek(body_offset)
        text = f.read().decode("ascii", errors="replace")
    return np.array(text.split(), dtype=np.float64)


def read_pcd(path: str) -> np.ndarray:
    """Read a .pcd file; returns (N, 3) float32 xyz."""
    header, body_offset = _read_header(path)
    data_kind = header["DATA"][0].lower()

    if data_kind == "ascii":
        from icp_variants_tpu.runtime import native

        want = _ascii_count(header)
        # f32 scan, same rounding as the batch path (strtof in both).
        arr = native.parse_floats(path, body_offset, want, dtype=np.float32)
        if arr is None or arr.size != want:
            arr = _read_ascii_fallback(path, body_offset)
        return _ascii_xyz(arr, header)

    if data_kind == "binary":
        with open(path, "rb") as f:
            f.seek(body_offset)
            body = f.read()
        return _binary_xyz(body, header)

    raise ValueError(f"{path}: unsupported PCD DATA kind {data_kind!r}")


def read_pcd_batch(paths: list[str], n_threads: int = 0) -> list[np.ndarray]:
    """Read many .pcd files, parsing all ASCII bodies CONCURRENTLY through
    the native thread pool. Same per-file results as :func:`read_pcd`;
    falls back to sequential reads when the native library is absent."""
    from icp_variants_tpu.runtime import native

    headers = [_read_header(p) for p in paths]
    out: list[np.ndarray | None] = [None] * len(paths)

    ascii_ids = [
        i for i, (h, _) in enumerate(headers)
        if h["DATA"][0].lower() == "ascii"
    ]
    if ascii_ids:
        specs = [
            (paths[i], headers[i][1], _ascii_count(headers[i][0]))
            for i in ascii_ids
        ]
        arrays = native.parse_floats_f32_batch(specs, n_threads=n_threads)
        if arrays is not None:
            for i, arr in zip(ascii_ids, arrays):
                header, body_offset = headers[i]
                if arr.size != _ascii_count(header):
                    arr = _read_ascii_fallback(paths[i], body_offset)
                out[i] = _ascii_xyz(arr, header)

    for i, (header, body_offset) in enumerate(headers):
        if out[i] is not None:
            continue
        kind = header["DATA"][0].lower()
        if kind == "ascii":
            out[i] = _ascii_xyz(
                _read_ascii_fallback(paths[i], body_offset), header
            )
        elif kind == "binary":
            with open(paths[i], "rb") as f:
                f.seek(body_offset)
                out[i] = _binary_xyz(f.read(), header)
        else:
            raise ValueError(
                f"{paths[i]}: unsupported PCD DATA kind {kind!r}"
            )
    return out


def read_pcd_point_count(path: str) -> int:
    """Read only the POINTS field from a .pcd header (no body parse) —
    lets dataset sweeps pre-scan cloud sizes to fix a shared capacity
    before building any device arrays."""
    with open(path, "rb") as f:
        while True:
            raw = f.readline()
            if not raw:
                raise ValueError(
                    f"{path}: EOF before POINTS/DATA line (truncated or "
                    "not a .pcd)"
                )
            line = raw.decode("ascii", errors="replace").strip()
            if not line:
                continue
            key, _, rest = line.partition(" ")
            if key.upper() == "POINTS":
                return int(rest.split()[0])
            if key.upper() == "DATA":
                raise ValueError(f"{path}: header has no POINTS field")


def write_pcd(path: str, points: np.ndarray, binary: bool = True) -> None:
    """Write xyz points as a v0.7 .pcd (round-trip partner of read_pcd)."""
    points = np.asarray(points, np.float32)
    n = len(points)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(points.tobytes())
        else:
            np.savetxt(f, points, fmt="%.7g")
