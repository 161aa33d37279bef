"""Merges rd_out/ partial results into RD_PARITY.json.

Per family: cross-implementation (reference-TF vs repo-JAX) bpp/PSNR at
each lambda, with deltas.  Plus the model-ordering analysis the
reference's Kodak results establish (ms2020 >= bmshj2018 >= bls2017 at
equal bpp; /root/reference/results/image_compression/kodak/
PSNR_sRGB_RGB/minnen-2020-icip.txt:12-21 vs balle-2018/2017): each
family's (bpp, PSNR) points are linearly interpolated onto a shared bpp
grid and compared pairwise, separately for each implementation.

Usage: python rd_merge.py   (reads rd_out/*.json, writes ../../RD_PARITY.json)
"""

import glob
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FAMILIES = ("bls2017", "bmshj2018", "ms2020")


def load_points(dirname="rd_out"):
    pts = {}
    for path in sorted(glob.glob(os.path.join(HERE, dirname, "*.json"))):
        name = os.path.basename(path)
        if name.startswith(("probe", "tfprobe")):
            continue
        with open(path) as f:
            r = json.load(f)
        pts.setdefault((r["family"], r["impl"]), []).append(r)
    for v in pts.values():
        v.sort(key=lambda r: r["lmbda"])
    return pts


def ordering_points(pts):
    """Points for the cross-FAMILY ordering analysis.

    Cross-implementation parity wants matched steps per (family, lambda)
    pair; cross-family ordering wants matched CONVERGENCE across
    families.  rd_out_ord/ holds re-runs (jax side, step counts equal
    across families) that override rd_out entries per (family, impl,
    lambda) for the ordering analysis only.
    """
    merged = {k: {p["lmbda"]: p for p in v} for k, v in pts.items()}
    for k, v in load_points("rd_out_ord").items():
        merged.setdefault(k, {})
        for p in v:
            merged[k][p["lmbda"]] = p
    return {k: sorted(v.values(), key=lambda r: r["lmbda"])
            for k, v in merged.items()}


def interp_psnr(points, bpp_grid):
    """PSNR at given bpps via linear interpolation (NaN outside hull)."""
    bpps = np.asarray([p["bpp"] for p in points])
    psnrs = np.asarray([p["psnr_db"] for p in points])
    order = np.argsort(bpps)
    bpps, psnrs = bpps[order], psnrs[order]
    out = np.interp(bpp_grid, bpps, psnrs, left=np.nan, right=np.nan)
    out[(bpp_grid < bpps.min()) | (bpp_grid > bpps.max())] = np.nan
    return out


def main():
    pts = load_points()
    out = {"corpus": "rd_corpus.py synthetic (512 train / 24 eval, 64x64; "
                     "smooth base + shapes + non-stationary texture)",
           "families": {}}

    # Per-family cross-implementation table.  Round 4: the table uses
    # the BEST (rd_out_ord-overridden, post-init-fix, highest-step)
    # entry per (family, impl, lambda); each row records both sides'
    # step counts and whether the pair is step-matched, so the delta
    # columns are only quoted at matched convergence.
    merged = ordering_points(pts)
    for fam in FAMILIES:
        tf_pts = {p["lmbda"]: p for p in merged.get((fam, "tf"), [])}
        jx_pts = {p["lmbda"]: p for p in merged.get((fam, "jax"), [])}
        rows = []
        for lmbda in sorted(set(tf_pts) | set(jx_pts)):
            row = {"lambda": lmbda}
            if lmbda in tf_pts:
                row["ref_bpp"] = tf_pts[lmbda]["bpp"]
                row["ref_psnr_db"] = tf_pts[lmbda]["psnr_db"]
                row["ref_steps"] = tf_pts[lmbda]["steps"]
            if lmbda in jx_pts:
                row["tpu_bpp"] = jx_pts[lmbda]["bpp"]
                row["tpu_psnr_db"] = jx_pts[lmbda]["psnr_db"]
                row["tpu_steps"] = jx_pts[lmbda]["steps"]
            if lmbda in tf_pts and lmbda in jx_pts:
                row["matched_steps"] = (
                    row["ref_steps"] == row["tpu_steps"])
                row["delta_psnr_db"] = round(
                    row["tpu_psnr_db"] - row["ref_psnr_db"], 3)
                row["delta_bpp_pct"] = round(
                    100 * (row["tpu_bpp"] - row["ref_bpp"])
                    / max(row["ref_bpp"], 1e-9), 2)
            rows.append(row)
        if rows:
            out["families"][fam] = {"points": rows}

    # Better-converged re-run pairs (rd_out_ord): report cross-impl
    # deltas where BOTH impls have a record at identical steps there.
    ord_pts = load_points("rd_out_ord")
    conv = []
    for fam in FAMILIES:
        tf_o = {(p["lmbda"], p["steps"]): p
                for p in ord_pts.get((fam, "tf"), [])}
        for p in ord_pts.get((fam, "jax"), []):
            key = (p["lmbda"], p["steps"])
            if key in tf_o:
                q = tf_o[key]
                conv.append({
                    "family": fam, "lambda": p["lmbda"],
                    "steps": p["steps"],
                    "ref_bpp": q["bpp"], "ref_psnr_db": q["psnr_db"],
                    "tpu_bpp": p["bpp"], "tpu_psnr_db": p["psnr_db"],
                    "delta_psnr_db": round(
                        p["psnr_db"] - q["psnr_db"], 3),
                    "delta_bpp_pct": round(
                        100 * (p["bpp"] - q["bpp"])
                        / max(q["bpp"], 1e-9), 2)})
    if conv:
        out["converged_rerun_pairs"] = conv

    # Curve non-degeneracy: PSNR span of the jax bls curve.
    for impl in ("jax", "tf"):
        spans = {}
        for fam in FAMILIES:
            ps = [p["psnr_db"] for p in pts.get((fam, impl), [])]
            if len(ps) >= 2:
                spans[fam] = round(max(ps) - min(ps), 2)
        if spans:
            out[f"psnr_span_db_{impl}"] = spans

    # Model ordering at equal bpp (per implementation).
    opts = ordering_points(pts)
    for impl in ("jax", "tf"):
        pts_o = {k: v for k, v in opts.items() if k[1] == impl}
        fams = [f for f in FAMILIES if (f, impl) in pts_o
                and len(pts_o[(f, impl)]) >= 2]
        if len(fams) < 2:
            continue
        ordering = {}
        for hi_f, lo_f in (("bmshj2018", "bls2017"),
                           ("ms2020", "bmshj2018"),
                           ("ms2020", "bls2017")):
            if hi_f not in fams or lo_f not in fams:
                continue
            # Per-PAIR overlap: each comparison uses the bpp range both
            # of ITS curves cover (a 3-family common window would drop
            # the low-rate region where the hyperprior families win).
            a, b = pts_o[(hi_f, impl)], pts_o[(lo_f, impl)]
            lo = max(min(p["bpp"] for p in a), min(p["bpp"] for p in b))
            hi = min(max(p["bpp"] for p in a), max(p["bpp"] for p in b))
            if hi <= lo:
                continue
            grid = np.linspace(lo, hi, 9)
            d = interp_psnr(a, grid) - interp_psnr(b, grid)
            keep = ~np.isnan(d)
            if keep.any():
                dk = d[keep]
                ordering[f"{hi_f}_minus_{lo_f}_db"] = {
                    "bpp_overlap": [round(lo, 4), round(hi, 4)],
                    "mean": round(float(dk.mean()), 3),
                    "min": round(float(dk.min()), 3),
                    "max": round(float(dk.max()), 3),
                    "holds": bool((dk > -0.05).all()),
                    "per_bpp": [
                        [round(float(b_), 3), round(float(v), 3)]
                        for b_, v in zip(grid[keep], dk)],
                }
        if ordering:
            ordering["note"] = (
                "compact-config corpus saturates near 29.5 dB; in the "
                "saturation knee (>~0.4 bpp) hyperprior side-information "
                "costs bits without distortion headroom to spend them "
                "on, which is where bmshj-vs-bls can locally invert — "
                "the reference's Kodak ordering claim is about "
                "unsaturated operating points")
        out[f"ordering_at_equal_bpp_{impl}"] = ordering

    path = os.path.join(HERE, "..", "..", "RD_PARITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
