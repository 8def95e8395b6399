"""Measured-MFU helper: profile one batched ADMM solve with jax.profiler
and report the dominant device kernel's achieved FLOP/s against peak.

Replaces the labelled-rough ``eigh_gflops_per_row`` proxy (round-4 verdict
item 8) with numbers read from an actual profiler trace: device-lane kernel
durations from the TensorBoard ``*.trace.json.gz``, an analytic FLOP count
of the ADMM iteration's matmul chain (the 14-step quintic/cubic sign
schedule = 43 matmuls per PSD projection, ``omc/ops/polar.py``), and a
documented peak assumption for the chip.

If the backend's profiler emits no device lane (remote-tunnel backends may
not), the caller gets ``None`` and should say so rather than fake a number.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os

# f32 matmul peak assumption for the benched chip.  TPU v5e peak is
# ~197 TFLOP/s bf16; f32 accumulation at HIGHEST precision runs the MXU in
# multi-pass mode, conventionally ~1/4 of bf16 -> ~49 TFLOP/s.  Recorded in
# the output so the assumption is auditable.
PEAK_F32_FLOPS = float(os.environ.get("OMC_PEAK_F32_FLOPS", 49e12))

_SIGN_MATMULS = 43  # 12 quintic (3 matmuls) + 2 cubic (2) + sign apply (1+..)


def admm_iter_flops(n: int, m: int, k: int, B: int, merged: bool = True) -> float:
    """Analytic matmul FLOPs of ONE ADMM iteration over a B-row batch.

    Dominant work: the PSD projections' matrix-sign chains.  The merged
    path pads the three blocks (n+m, n+k, n) to the largest and runs one
    (3B, n+m, n+m) chain; the unmerged path runs per-block chains."""
    d1, d2, d3 = n + m, n + k, n
    mm = lambda d: 2.0 * d**3
    if merged:
        per_row = _SIGN_MATMULS * 3 * mm(d1)
    else:
        per_row = _SIGN_MATMULS * (mm(d1) + mm(d2) + mm(d3))
    return per_row * B


def parse_device_kernel_times(trace_dir: str):
    """Aggregate per-kernel device time from the newest trace under
    ``trace_dir``.  Returns (device_total_us, top_list, found_device_lane)
    where top_list is [(name, duration_us, count), ...] sorted desc."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    if not paths:
        return 0.0, [], False
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    lane_of = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            lane_of[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {
        pid for pid, name in lane_of.items()
        if ("TPU" in name or "GPU" in name or "/device:" in name.upper())
        and "host" not in name.lower()
    }
    if not dev_pids:
        return 0.0, [], False
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            dur[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    top = [(name, d, cnt[name]) for name, d in dur.most_common(10)]
    total = float(sum(dur.values()))
    return total, top, True


def measured_mfu(trace_dir: str, n: int, m: int, k: int, B: int,
                 iters_traced: int):
    """MFU of the traced ADMM solve: analytic iteration FLOPs / device
    kernel time / peak.  Returns a dict or None when no device lane."""
    total_us, top, found = parse_device_kernel_times(trace_dir)
    if not found or total_us <= 0:
        return None
    flops = admm_iter_flops(n, m, k, B) * iters_traced
    achieved = flops / (total_us * 1e-6)
    return {
        "device_kernel_time_s": round(total_us * 1e-6, 4),
        "analytic_flops": flops,
        "achieved_tflops": round(achieved / 1e12, 3),
        "peak_f32_tflops_assumed": PEAK_F32_FLOPS / 1e12,
        "mfu_pct": round(100.0 * achieved / PEAK_F32_FLOPS, 2),
        "top_kernels": [
            {"name": name[:80], "ms": round(d / 1e3, 3), "count": c}
            for name, d, c in top[:5]
        ],
    }
