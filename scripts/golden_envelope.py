"""Calibrate the golden-comparison gates against the reference's OWN
run-to-run variance.

The committed golden (/root/reference/src/ex6/dataset1/result.bmp) was
produced by a pipeline whose RANSAC is seeded with srand(time(0))
(src/ex6/ImageProcess.cpp:403) — it is ONE random draw, not a reproducible
target. This script runs the reference's own binary (built unmodified by
scripts/build_ex6_ref.sh, seeded via an LD_PRELOAD time() shim) across many
seeds and measures how much the reference disagrees WITH ITSELF, then
places our panorama inside that distribution.

Comparison metric (same as scripts/compare_golden.py): canvas delta +
mean-abs-diff / PSNR over the min-size top-left crop where both canvases
have content.

Usage (CPU-only for the reference runs; pass --ours to score a panorama):
    python scripts/golden_envelope.py [--seeds 10] [--ours result.bmp]
Writes GOLDEN_ENVELOPE.md at the repo root.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
DATASET = "/root/reference/src/ex6/dataset1"
GOLDEN = f"{DATASET}/result.bmp"
RUNS = "/tmp/golden_env"


def ensure_tool():
    if not (os.path.exists(f"{REPO}/build/ex6_ref")
            and os.path.exists(f"{REPO}/build/libfaketime.so")):
        subprocess.run(["sh", f"{REPO}/scripts/build_ex6_ref.sh"], check=True)


def run_seed(seed: int, ds_dir: str) -> str:
    out = f"{RUNS}/ref_{seed}.bmp"
    if not os.path.exists(out):
        env = dict(os.environ,
                   LD_PRELOAD=f"{REPO}/build/libfaketime.so",
                   FAKE_TIME=str(seed))
        subprocess.run([f"{REPO}/build/ex6_ref", ds_dir + "/", "4", out],
                       env=env, check=True, capture_output=True, timeout=600)
    return out


def compare(a: np.ndarray, b: np.ndarray) -> dict:
    h = min(a.shape[0], b.shape[0])
    w = min(a.shape[1], b.shape[1])
    af = a[:h, :w].astype(np.float64)
    bf = b[:h, :w].astype(np.float64)
    m = (af.sum(-1) > 0) & (bf.sum(-1) > 0)
    diff = np.abs(af - bf)[m]
    mse = float((diff ** 2).mean())
    return {
        "canvas_delta": (abs(a.shape[0] - b.shape[0]),
                         abs(a.shape[1] - b.shape[1])),
        "mad": float(diff.mean()),
        "psnr": 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else float("inf"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--ours", default=None,
                    help="our panorama bmp to place inside the envelope")
    ap.add_argument("--out", default=f"{REPO}/GOLDEN_ENVELOPE.md")
    args = ap.parse_args()

    from computervisionimagestich2_tpu.utils.io import load_image

    ensure_tool()
    os.makedirs(RUNS, exist_ok=True)
    # dataset dir must be writable for CImg (the driver writes elsewhere,
    # but inputs are opened read-only; copy defensively anyway)
    ds = f"{RUNS}/ds1"
    if not os.path.exists(ds):
        os.makedirs(ds)
        for i in range(1, 5):
            with open(f"{DATASET}/{i}.bmp", "rb") as fi, \
                    open(f"{ds}/{i}.bmp", "wb") as fo:
                fo.write(fi.read())

    golden = load_image(GOLDEN)
    seeds = [1000 * (i + 1) for i in range(args.seeds)]
    refs = {}
    for s in seeds:
        refs[s] = load_image(run_seed(s, ds))

    rows, mads, psnrs, dws = [], [], [], []
    for s in seeds:
        c = compare(golden, refs[s])
        rows.append(f"| seed {s} | {refs[s].shape[1]}x{refs[s].shape[0]} | "
                    f"({c['canvas_delta'][0]},{c['canvas_delta'][1]}) | "
                    f"{c['mad']:.1f} | {c['psnr']:.1f} |")
        mads.append(c["mad"])
        psnrs.append(c["psnr"])
        dws.append(c["canvas_delta"][1])

    # cross-matrix: is ours-vs-ref distributed like ref-vs-ref? (excludes
    # the catastrophic-consensus runs so the family is the "successful" mode)
    good = [s for s in seeds
            if abs(refs[s].shape[1] - golden.shape[1]) < 100]
    fam = [refs[s] for s in good] + [golden]
    rr = [compare(fam[i], fam[j])["mad"]
          for i in range(len(fam)) for j in range(i + 1, len(fam))]
    cross = ""
    if rr:
        cross = (f"\nRef-vs-ref MAD across successful runs (n={len(rr)}"
                 f" pairs): {min(rr):.1f}..{max(rr):.1f}, median"
                 f" {float(np.median(rr)):.1f}.")

    ours_row = ""
    ours_verdict = ""
    if args.ours:
        ours = load_image(args.ours)
        c = compare(golden, ours)
        ours_row = (f"| **ours** | {ours.shape[1]}x{ours.shape[0]} | "
                    f"({c['canvas_delta'][0]},{c['canvas_delta'][1]}) | "
                    f"{c['mad']:.1f} | {c['psnr']:.1f} |")
        ro = [compare(ours, f)["mad"] for f in fam]
        inside = (rr and max(ro) <= max(rr) + 1.0
                  and c["canvas_delta"][1] <= max(8, max(dws)))
        ours_verdict = (
            f"\n**Ours vs golden: MAD {c['mad']:.1f}, PSNR {c['psnr']:.1f} dB,"
            f" canvas delta ({c['canvas_delta'][0]},{c['canvas_delta'][1]})."
            f" Ours-vs-ref MAD {min(ro):.1f}..{max(ro):.1f} (median"
            f" {float(np.median(ro)):.1f}) — "
            f"{'INSIDE' if inside else 'OUTSIDE'} the ref-vs-ref family"
            f" ({min(rr):.1f}..{max(rr):.1f}).**\n" if rr else "")
        print(ours_verdict)

    body = f"""# Golden-output envelope — the reference vs itself

The golden `result.bmp` was produced with `srand(time(0))`
(src/ex6/ImageProcess.cpp:403): it is one random RANSAC draw. Bit-exact
reproduction is impossible in principle, so the honest gate is: does our
output sit inside the distribution of the REFERENCE'S OWN outputs across
seeds? Below, the reference binary (compiled unmodified from
/root/reference/src/ex6, headless driver + LD_PRELOAD time() shim) runs
dataset1 at {len(seeds)} fixed seeds, each compared against the committed
golden (1057x525) with the same metric as scripts/compare_golden.py.

| run | canvas (WxH) | canvas delta (h,w) | overlap MAD | PSNR (dB) |
|---|---|---|---|---|
{chr(10).join(rows)}
{ours_row}

Reference self-variance vs golden: MAD {min(mads):.1f}..{max(mads):.1f},
PSNR {min(psnrs):.1f}..{max(psnrs):.1f} dB, canvas width delta
{min(dws)}..{max(dws)} px. Note the catastrophic-width runs (e.g. ~822 px):
the reference's 4-point RANSAC occasionally settles on a bad consensus and
truncates the panorama — its output distribution is heavy-tailed.
{cross}
{ours_verdict}"""
    with open(args.out, "w") as f:
        f.write(body)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
