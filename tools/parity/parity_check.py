#!/usr/bin/env python
"""Bit-level parity check against the compiled reference implementation.

Builds the unmodified reference (g++ over /root/reference sources + the
harness in this directory), runs both engines over identical value
streams — including configurations that force γ²-collapse escalation and
last/first-bucket collapses, and two-sketch merges — and compares:

  n, bin count, alpha, gamma (exact float repr), every (key, count) bin,
  and all 11 reference quantile estimates (exact doubles).

Our adds replay per-item (``DDSketch.add``) to match the reference's
per-insert limit check; quantile q is routed through float32 first
because the reference API takes ``float q`` (ddsketch.h).

Run: python tools/parity/parity_check.py   (requires g++ + /root/reference)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from ddsketch_ray.sketches.ddsketch import DDSketch  # noqa: E402

REFERENCE = "/root/reference"
HARNESS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity_main.cpp")
QS = [0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99]
MODE_NAME = {1: "collapse", 2: "last", 3: "first"}


def build_harness(tmp: str) -> str:
    exe = os.path.join(tmp, "parity_main")
    subprocess.run(
        [
            "g++", "-O2", "-std=c++14", "-o", exe,
            HARNESS,
            os.path.join(REFERENCE, "ddsketch.cc"),
            os.path.join(REFERENCE, "error.cpp"),
        ],
        check=True,
    )
    return exe


def run_reference(exe, csv, bin_limit, alpha, mode, csv2=None):
    args = [exe, csv, str(bin_limit), repr(alpha), str(mode)]
    if csv2:
        args.append(csv2)
    out = subprocess.run(args, capture_output=True, text=True, check=True).stdout
    head, bins, qs = {}, {}, {}
    for line in out.splitlines():
        if line.startswith("n="):
            for part in line.split():
                k, v = part.split("=")
                head[k] = float(v) if k in ("alpha", "gamma") else int(v)
        elif line.startswith("bin "):
            _, k, c = line.split()
            bins[int(k)] = int(c)
        elif line.startswith("q "):
            _, q, est = line.split()
            qs[float(q)] = float(est)
    return head, bins, qs


def run_ours(vals, bin_limit, alpha, mode, vals2=None):
    def build(v):
        sk = DDSketch(alpha=alpha, bin_limit=bin_limit, mode=MODE_NAME[mode])
        for x in v:  # per-item to mirror the reference's per-insert check
            sk.add(float(x))
        return sk

    sk = build(vals)
    if vals2 is not None:
        sk.merge(build(vals2))
    qs = {}
    for q in QS:
        qf = float(np.float32(q))  # reference API takes float q
        qs[round(q, 2)] = sk.quantile(qf)
    return sk, qs


def compare(name, head, bins, qs, sk, our_qs) -> list[str]:
    errs = []
    if head["n"] != sk.n:
        errs.append(f"n: ref={head['n']} ours={sk.n}")
    if head["size"] != sk.size:
        errs.append(f"size: ref={head['size']} ours={sk.size}")
    if head["alpha"] != sk.alpha:
        errs.append(f"alpha: ref={head['alpha']!r} ours={sk.alpha!r}")
    if head["gamma"] != sk.gamma:
        errs.append(f"gamma: ref={head['gamma']!r} ours={sk.gamma!r}")
    if bins != sk.bins:
        only_ref = {k: v for k, v in bins.items() if sk.bins.get(k) != v}
        only_ours = {k: v for k, v in sk.bins.items() if bins.get(k) != v}
        errs.append(f"bins differ: ref-side {list(only_ref.items())[:5]} ours-side {list(only_ours.items())[:5]}")
    for q in QS:
        r, o = qs[round(q, 2)], our_qs[round(q, 2)]
        if r != o:
            errs.append(f"q{q}: ref={r!r} ours={o!r}")
    return errs


def main() -> int:
    rng = np.random.default_rng(42)
    cases = [
        # (name, values, bin_limit, alpha, mode, values2)
        ("no-collapse uniform-wide", rng.uniform(10, 4e5, 50_000), 4096, 0.008, 1, None),
        ("gamma2-collapse uniform-wide", rng.uniform(10, 4e5, 50_000), 500, 0.008, 1, None),
        ("gamma2-collapse tight limit", rng.uniform(10, 4e5, 30_000), 120, 0.008, 1, None),
        ("mixed-sign with zeros", np.concatenate([rng.uniform(-50, 0, 20_000), [0.0] * 57, rng.uniform(10, 4e5, 20_000)]), 500, 0.008, 1, None),
        ("last-bucket collapse", rng.uniform(10, 4e5, 30_000), 300, 0.008, 2, None),
        ("first-bucket collapse", rng.uniform(10, 4e5, 30_000), 300, 0.008, 3, None),
        ("merge gamma2 (the active reference experiment)", rng.uniform(-50, 0, 30_000), 500, 0.008, 1, rng.uniform(10, 4e5, 30_000)),
        ("merge last-bucket", rng.uniform(10, 4e5, 20_000), 300, 0.008, 2, rng.uniform(10, 4e5, 20_000)),
        ("exponential near-zero", rng.exponential(1 / 17, 50_000), 500, 0.008, 1, None),
    ]
    failures = 0
    with tempfile.TemporaryDirectory(prefix="parity-") as tmp:
        exe = build_harness(tmp)
        for i, (name, vals, bl, alpha, mode, vals2) in enumerate(cases):
            csv = os.path.join(tmp, f"v{i}.csv")
            np.savetxt(csv, vals, fmt="%.17g")
            csv2 = None
            if vals2 is not None:
                csv2 = os.path.join(tmp, f"v{i}b.csv")
                np.savetxt(csv2, vals2, fmt="%.17g")
            head, bins, qs = run_reference(exe, csv, bl, alpha, mode, csv2)
            sk, our_qs = run_ours(vals, bl, alpha, mode, vals2)
            errs = compare(name, head, bins, qs, sk, our_qs)
            status = "IDENTICAL" if not errs else "MISMATCH"
            print(f"[{status}] {name} (bins={sk.size}, n={sk.n}, alpha={sk.alpha:.6g})")
            for e in errs:
                print(f"    {e}")
                failures += 1
    print("PARITY: PASS" if failures == 0 else f"PARITY: {failures} mismatches")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
