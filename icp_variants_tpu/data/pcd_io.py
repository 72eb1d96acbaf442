"""PCD (Point Cloud Data) file reader — host side, numpy.

Replaces the PCL ``loadPCDFile`` dependency of the ETH loader
(ETHDataLoader.h:66-89). Supports the v0.7 format in ``ascii``,
``binary`` and (optionally gzip-transparent) files with arbitrary field
layouts; only x/y/z are extracted, like the reference's
``pcl::PointXYZ`` load.
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


def read_pcd(path: str) -> np.ndarray:
    """Read a .pcd file; returns (N, 3) float32 xyz."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, rest = line.partition(" ")
            header[key.upper()] = rest.split()
            if key.upper() == "DATA":
                break
        body_offset = f.tell()
        body = f.read()

    fields = [s.lower() for s in header["FIELDS"]]
    sizes = [int(s) for s in header["SIZE"]]
    types = header["TYPE"]
    counts = [int(s) for s in header.get("COUNT", ["1"] * len(fields))]
    n_points = int(header["POINTS"][0])
    data_kind = header["DATA"][0].lower()

    if data_kind == "ascii":
        row_len = sum(counts)
        from icp_variants_tpu.runtime import native

        arr = native.parse_floats(path, body_offset, n_points * row_len)
        if arr is None or arr.size != n_points * row_len:
            text = body.decode("ascii", errors="replace")
            arr = np.array(text.split(), dtype=np.float64)
        arr = arr[: n_points * row_len].reshape(n_points, row_len)
        cols = {}
        off = 0
        for name, cnt in zip(fields, counts):
            cols[name] = arr[:, off]
            off += cnt
        xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
        return xyz.astype(np.float32)

    if data_kind == "binary":
        dtype_fields = []
        for name, size, typ, cnt in zip(fields, sizes, types, counts):
            base = _DTYPES[(typ, size)]
            if cnt == 1:
                dtype_fields.append((name, base))
            else:
                dtype_fields.append((name, base, (cnt,)))
        dt = np.dtype(dtype_fields)
        arr = np.frombuffer(body, dtype=dt, count=n_points)
        xyz = np.stack(
            [arr["x"].astype(np.float32), arr["y"].astype(np.float32), arr["z"].astype(np.float32)],
            axis=1,
        )
        return xyz

    raise ValueError(f"{path}: unsupported PCD DATA kind {data_kind!r}")


def read_pcd_point_count(path: str) -> int:
    """Read only the POINTS field from a .pcd header (no body parse) —
    lets dataset sweeps pre-scan cloud sizes to fix a shared capacity
    before building any device arrays."""
    with open(path, "rb") as f:
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
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
