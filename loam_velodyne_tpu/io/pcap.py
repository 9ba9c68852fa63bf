"""Velodyne PCAP capture reading (and writing, for fixtures).

Replaces the velodyne_driver + velodyne_pointcloud stack that feeds the
reference's /velodyne_points topic: decodes raw VLP-16 UDP payloads
(1206 bytes: 12 blocks x [0xFFEE, azimuth/100 deg, 32 x (range*2mm,
reflectivity)]) into sensor-frame sweeps segmented at azimuth rollover.
Native C++ fast path (native/loamio.cc) with a numpy fallback.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from loam_velodyne_tpu.config import LidarConfig

VLP16_ELEVATIONS_DEG = np.array(
    [-15, 1, -13, 3, -11, 5, -9, 7, -7, 9, -5, 11, -3, 13, -1, 15],
    np.float64)

_PCAP_MAGIC = 0xA1B2C3D4
_UDP_HEADER = 42
_PAYLOAD = 1206


def _decode_payload(payload: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """One 1206-byte payload -> (xyz (M,3), azimuth_deg (M,))."""
    pts, azs = [], []
    for b in range(12):
        blk = payload[b * 100:(b + 1) * 100]
        (flag, az_raw) = struct.unpack_from("<HH", blk, 0)
        if flag != 0xEEFF:
            continue
        az0 = az_raw / 100.0
        if b + 1 < 12:
            az1 = struct.unpack_from("<H", payload, (b + 1) * 100 + 2)[0] / 100.0
            if az1 < az0:
                az1 += 360.0
        else:
            az1 = az0 + 0.4
        rec = np.frombuffer(blk, np.uint8, 96, 4)
        raw = (rec.reshape(32, 3)[:, 0].astype(np.uint16)
               | (rec.reshape(32, 3)[:, 1].astype(np.uint16) << 8))
        dist = raw.astype(np.float64) * 0.002
        for firing in range(2):
            az = az0 + (az1 - az0) * 0.5 * firing
            d = dist[firing * 16:(firing + 1) * 16]
            ok = d > 0
            if not ok.any():
                continue
            el = np.deg2rad(VLP16_ELEVATIONS_DEG[ok])
            azr = np.deg2rad(az)
            dd = d[ok]
            ce = np.cos(el)
            pts.append(np.stack([dd * ce * np.cos(azr),
                                 -dd * ce * np.sin(azr),
                                 dd * np.sin(el)], axis=1))
            azs.append(np.full(ok.sum(), az))
    if not pts:
        return np.zeros((0, 3)), np.zeros((0,))
    return np.concatenate(pts), np.concatenate(azs)


def _python_read(path: str) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    with open(path, "rb") as f:
        gh = f.read(24)
        (magic,) = struct.unpack("<I", gh[:4])
        if magic == _PCAP_MAGIC:
            endian = "<"
        elif struct.unpack(">I", gh[:4])[0] == _PCAP_MAGIC:
            endian = ">"
        else:
            raise ValueError(f"{path}: not a pcap file")
        sweeps, rels = [], []
        cur_xyz, cur_az = [], []
        prev_az = None
        while True:
            ph = f.read(16)
            if len(ph) < 16:
                break
            (_, _, incl, _) = struct.unpack(endian + "IIII", ph)
            data = f.read(incl)
            if len(data) < _UDP_HEADER + _PAYLOAD:
                continue
            xyz, az = _decode_payload(data[_UDP_HEADER:_UDP_HEADER + _PAYLOAD])
            for i in range(len(az)):
                if prev_az is not None and az[i] < prev_az - 180.0:
                    sweeps.append(np.concatenate(cur_xyz)
                                  if cur_xyz else np.zeros((0, 3)))
                    a = np.concatenate(cur_az) if cur_az else np.zeros((0,))
                    rels.append(_rel_from_az(a))
                    cur_xyz, cur_az = [], []
                prev_az = az[i]
                cur_xyz.append(xyz[i:i + 1])
                cur_az.append(az[i:i + 1])
        if cur_xyz:
            sweeps.append(np.concatenate(cur_xyz))
            rels.append(_rel_from_az(np.concatenate(cur_az)))
    return ([s.astype(np.float32) for s in sweeps],
            [r.astype(np.float32) for r in rels])


def _rel_from_az(az: np.ndarray) -> np.ndarray:
    if len(az) == 0:
        return az
    rel = az - az[0]
    rel[rel < 0] += 360.0
    return rel / 360.0


def read_pcap_sweeps(path: str, lidar: LidarConfig, native: bool = True
                     ) -> Tuple[List[np.ndarray], List[float]]:
    """Returns (sweeps, nominal_times). Native path when available."""
    import os
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if native:
        out = _native_read(path)
        if out is not None:
            sweeps = out
            return sweeps, [0.1 * i for i in range(len(sweeps))]
    sweeps, _rels = _python_read(path)
    return sweeps, [0.1 * i for i in range(len(sweeps))]


def _native_read(path: str):
    import ctypes
    from loam_velodyne_tpu.io.native import load
    lib = load()
    if lib is None:
        return None
    h = lib.loam_pcap_open(path.encode())
    if not h:
        raise ValueError(f"{path}: not a pcap file")
    cap = 600000
    xyz = np.zeros((cap, 3), np.float32)
    rel = np.zeros((cap,), np.float32)
    sweeps = []
    try:
        while True:
            n = lib.loam_pcap_next_sweep(
                h, xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
            if n <= 0:
                break
            sweeps.append(xyz[:n].copy())
    finally:
        lib.loam_pcap_close(h)
    return sweeps


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------

def write_pcap(path: str, packets: List[bytes]) -> None:
    """Write raw 1206-byte Velodyne payloads as a UDP pcap capture."""
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", _PCAP_MAGIC, 2, 4, 0, 0, 65535, 1))
        for i, payload in enumerate(packets):
            frame = b"\x00" * _UDP_HEADER + payload
            f.write(struct.pack("<IIII", i // 10, (i % 10) * 100000,
                                len(frame), len(frame)))
            f.write(frame)


def make_vlp16_packet(azimuths_deg: List[float],
                      ranges_m: np.ndarray) -> bytes:
    """Build one VLP-16 payload. azimuths_deg: 12 block azimuths;
    ranges_m: (12, 32) ranges in meters (0 = no return)."""
    out = b""
    for b in range(12):
        out += struct.pack("<HH", 0xEEFF, int(round(azimuths_deg[b] * 100)))
        for ch in range(32):
            raw = int(round(ranges_m[b, ch] / 0.002))
            out += struct.pack("<HB", raw & 0xFFFF, 50)
    out += struct.pack("<IBB", 0, 0x37, 0x22)
    return out
