"""Generate the per-impl / per-size accuracy table from driver-captured rows.

Round-4 verdict finding: README/STATUS/PERFORMANCE carried three mutually
incompatible hand-maintained accuracy numbers for the same nominal config.
Fix: this script derives ``docs/ACCURACY.md`` from the *driver-captured*
records only — the latest ``BENCH_r*.json`` (every speed row carries the
BKW Linf measured in the same jit, ``bench.py:measure``) plus the latest
on-hardware selfcheck matrix (``Results/selfcheck_matrix_r*.txt``).  Prose
documents cite the table instead of repeating numbers.

    python benchmarks/accuracy_table.py          # rewrite docs/ACCURACY.md
    python benchmarks/accuracy_table.py --check  # verify it is up to date
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

# row key -> (impl label, grid, precision/notes)
_BENCH_ROWS = {
    "_top": ("fused (default)", "32^3", "f32 in/out, bf16 matmul passes"),
    "nv64_ns12_f32": ("fused (default)", "64^3", "f32 in/out, bf16 matmul passes"),
    "ds_oz_nv32_ns12": ("ds-oz (compensated)", "32^3", "f32 pairs, ~49 mantissa bits"),
    "ds_oz_nv64_ns12": ("ds-oz (compensated)", "64^3", "f32 pairs, general input"),
    "ds_oz_nv64_ns12_rev": (
        "ds-oz + g1_reversal", "64^3", "EXACT only for centrally-symmetric f"
    ),
    "ds_oz_nv64_ns12_cmax4": (
        "ds-oz oz_cmax=4", "64^3", "accuracy midpoint (frontier row)"
    ),
    "fused_nv32_ns12_batch8": (
        "fused, vmapped batch", "32^3",
        "8 independent relaxations (the reference's own trial semantics)"
    ),
}


def latest(pattern: str):
    files = sorted(ROOT.glob(pattern))
    return files[-1] if files else None


def bench_rows():
    src = latest("BENCH_r*.json")
    if src is None:
        return None, []
    data = json.loads(src.read_text())
    rec = data.get("parsed", data)
    rows = []
    for key, (impl, grid, note) in _BENCH_ROWS.items():
        r = rec if key == "_top" else rec.get(key)
        if not isinstance(r, dict) or "bkw_linf" not in r:
            continue
        rows.append(
            (impl, grid, f"{r['bkw_linf']:.4e}", f"{r['value']:.6g}", note)
        )
    return src.name, rows


def latest_selfcheck():
    src = latest("Results/selfcheck_matrix_r*.txt")
    return src.name if src else None


def render() -> str:
    bsrc, brows = bench_rows()
    ssrc = latest_selfcheck()
    out = [
        "# Accuracy — driver-captured, per impl and size",
        "",
        "BKW Linf error (reference convention, `maxwell_bkw_fftw.cpp:144-166`)",
        "for each tracked pipeline, **generated from the captured records — do",
        "not hand-edit** (`python benchmarks/accuracy_table.py`).  Every Linf",
        "below was measured in the same jitted program as the speed number on",
        f"the row (bench.py methodology), from `{bsrc}`.",
        "",
        "| pipeline | grid (Ns=12) | BKW Linf | evals/s | precision / input class |",
        "|---|---|---|---|---|",
    ]
    for impl, grid, linf, rate, note in brows:
        out.append(f"| {impl} | {grid} | {linf} | {rate} | {note} |")
    out += [
        "",
        "Reference anchors (f64, `Results/maxwell_bkw_fftw_atomics.txt`):",
        "Linf 4.2512e-05 at 32^3 (:21), 3.0685e-12 at 64^3 (:197).  The f64",
        "CPU backend of this repo reproduces both to every printed digit",
        "(`tests/test_operator.py`); the ds-oz rows above reproduce the 64^3",
        "digits on f32-only TPU hardware.",
        "",
        "Notes:",
        "",
        "* The fused default rows carry bf16-matmul-pass rounding (the speed",
        "  tier); `fused_precision=\"highest\"` floors at ~1.6e-8 at 64^3",
        "  (f32-transform floor — `benchmarks/probe_stage_err.py`,",
        "  docs/PERFORMANCE.md).  The staged rfft f32 path reproduces the",
        "  f64 Linf to four digits at 32^3 (method-error dominated).",
        "* `oz_cmax` trades the last ds digits for speed along a measured",
        "  ladder (docs/PERFORMANCE.md \"accuracy midpoint\").",
        f"* Per-round hardware re-verification: `Results/{ssrc}`" if ssrc
        else "",
        "",
    ]
    return "\n".join(out).rstrip() + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if docs/ACCURACY.md is stale")
    args = ap.parse_args(argv)
    target = ROOT / "docs" / "ACCURACY.md"
    text = render()
    if args.check:
        if target.exists() and target.read_text() == text:
            print("docs/ACCURACY.md is up to date")
            return 0
        print("docs/ACCURACY.md is STALE — regenerate with "
              "python benchmarks/accuracy_table.py")
        return 1
    target.write_text(text)
    print(f"wrote {target}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
