"""Analytic multi-chip scaling model for the halo-sharded SPMD layer.

This environment has ONE real TPU chip (axon tunnel) — wall-clock scaling
cannot be measured (virtual-mesh shards share one host's cores, and the
multi-process runs serialize on them; VERDICT r4 Weak #5). What CAN be
produced defensibly is the standard comm-volume model of the halo design
(SURVEY.md §2.5/§5: ring ppermute over ICI) composed with MEASURED
single-chip rooflines:

    t_D = work/(D * rate_1chip)  +  rounds * (lat + bytes_per_round / BW)
    eff = t_1 / (D * t_D)

Inputs the model reads from THIS repo (not hand-waved):
  - halo structure (hops, nb, per-level widths, per-device work balance)
    from `parallel.partition_rows` / `parallel.halo_tri_plan` on the real
    matrices,
  - single-chip throughputs from the driver-captured bench
    (BENCH_r04/BENCH_r05: spmv_general 0.63 Gnnz/s, sptrsv_pallas per-level
    step cost ~12 us derived from 5.2 Gnnz-row/s at 128 RHS over 2420
    levels).

Hardware constants (public v5e figures, stated as assumptions):
  - ICI: 1600 Gbps/chip aggregate, 2D torus -> ~45 GB/s one-way per link
    (sensitivity: 25 GB/s pessimistic),
  - per-ppermute latency ~1 us (2 us pessimistic).

Writes SCALING_r05_model.json and prints the table. See docs/DESIGN.md
"Scaling-efficiency model (round 5)".
"""

import json

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import rsparse_tpu as rs  # noqa: E402
from rsparse_tpu.data import Sprs  # noqa: E402
from rsparse_tpu.parallel import partition_rows  # noqa: E402
# halo_tri_plan structure recomputed inline (padded tensors OOM at n~1e6)
from rsparse_tpu.symbolic import schol, native  # noqa: E402
from rsparse_tpu import ops  # noqa: E402

# measured single-chip rates (driver-captured BENCH_r04 on v5e lite)
SPMV_RATE = 0.63e9  # nnz/s, general-pattern one-hot-MXU SpMV
SPTRSV_LEVEL_US = 12.0  # per-level step cost of the Pallas sweep (us)
SPTRSV_ENTRY_RATE = 5.2e9 / 128  # nnz-rows/s per RHS column at B=128

ICI_BW = 45e9  # B/s one-way per link (v5e 1600 Gbps/chip, 2D torus)
ICI_BW_PESS = 25e9
ICI_LAT = 1e-6
ICI_LAT_PESS = 2e-6


def laplacian(g):
    n = g * g
    idx = np.arange(n, dtype=np.int64)
    gx, gy = idx // g, idx % g
    rows, cols, vals = [idx], [idx], [np.full(n, 4.0)]
    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nx, ny = gx + dx, gy + dy
        ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
        rows.append((nx * g + ny)[ok])
        cols.append(idx[ok])
        vals.append(np.full(int(ok.sum()), -1.0))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    v = np.concatenate(vals)
    order = np.lexsort((r, c))
    p = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(c[order], minlength=n), out=p[1:])
    return Sprs(len(v), n, n, p, r[order], v[order])


def spmv_model(a, Ds):
    """Halo SpMV (gaxpy_halo): hops ppermute rounds, nb*8 B each way."""
    out = {}
    nnz = a.nnz()
    t1 = nnz / SPMV_RATE
    for D in Ds:
        rp = partition_rows(a, D)
        if rp is None:
            out[D] = None
            continue
        nb = rp.nb
        # per-device work balance from the real partition
        counts = np.bincount(a.i[: a.nnz()] // nb, minlength=D)
        balance = float(counts.max() / max(1.0, counts.mean()))
        comp = (nnz / D) * balance / SPMV_RATE
        comm = rp.hops * (ICI_LAT + nb * 8 / ICI_BW) * 2
        comm_p = rp.hops * (ICI_LAT_PESS + nb * 8 / ICI_BW_PESS) * 2
        tD = comp + comm
        out[D] = {
            "hops": int(rp.hops),
            "halo_bytes_per_call": int(2 * rp.hops * nb * 8),
            "work_balance_maxmean": round(balance, 3),
            "eff": round(t1 / (D * tD), 3),
            "eff_pessimistic": round(t1 / (D * (comp + comm_p)), 3),
        }
    return {"nnz": int(nnz), "per_D": out}


def sptrsv_model(t, Ds, kfuse=8):
    """Halo level-scheduled SpTRSV: ceil(nlev/kfuse) halo exchanges; the
    per-level fixed step cost (the measured latency floor of the sweep)
    does NOT shrink with D — the model shows exactly where that caps
    efficiency. Structure computed directly from the pattern (the padded
    HaloTriPlan tensors are not needed for the model and blow up memory
    at n ~ 10^6)."""
    from rsparse_tpu.ops.plan import col_ids

    out = {}
    nz = t.nnz()
    lev = native.tri_levels(t.n, t.p, t.i[:nz], 0)
    nlev = int(lev.max()) + 1
    cols = col_ids(t.p, t.n)
    rows = t.i[:nz].astype(np.int64)
    entlev = lev[cols]
    wl = np.bincount(entlev, minlength=nlev).astype(np.float64)
    t1 = float((wl / SPTRSV_ENTRY_RATE).sum() + nlev * SPTRSV_LEVEL_US * 1e-6)
    for D in Ds:
        nb = -(-t.n // D)
        hops = int(np.abs(cols // nb - rows // nb).max()) if nz else 0
        rounds = -(-nlev // kfuse)
        # balance: worst per-device entry count per level vs mean
        owner = rows // nb
        per_dev = np.zeros((D, nlev))
        np.add.at(per_dev, (owner, entlev), 1.0)
        worst = per_dev.max(axis=0)
        comp = float((worst / SPTRSV_ENTRY_RATE).sum()
                     + nlev * SPTRSV_LEVEL_US * 1e-6)
        comm = rounds * (ICI_LAT + max(hops, 1) * nb * 8 / ICI_BW) * 2
        comm_p = rounds * (ICI_LAT_PESS
                           + max(hops, 1) * nb * 8 / ICI_BW_PESS) * 2
        out[D] = {
            "hops": hops,
            "nlev": nlev,
            "exchanges": int(rounds),
            "eff": round(t1 / (D * (comp + comm)), 3),
            "eff_pessimistic": round(t1 / (D * (comp + comm_p)), 3),
        }
    return {"nnz": int(nz), "nlev": nlev, "per_D": out}


def main():
    Ds = (2, 4, 8)
    report = {"assumptions": {
        "spmv_rate_nnz_s": SPMV_RATE,
        "sptrsv_level_us": SPTRSV_LEVEL_US,
        "sptrsv_entry_rate": SPTRSV_ENTRY_RATE,
        "ici_bw_B_s": ICI_BW, "ici_bw_pessimistic": ICI_BW_PESS,
        "ici_latency_s": ICI_LAT, "ici_latency_pessimistic": ICI_LAT_PESS,
        "source": "BENCH_r04 single-chip rates; public v5e ICI figures",
    }}

    # SpMV: the BASELINE.md north-star (nnz/s scaling efficiency)
    for g in (512, 1024, 2048):
        a = laplacian(g)
        report[f"spmv_laplacian_{g}"] = spmv_model(a, Ds)

    # SpTRSV on a real factor: cholsol_7's L (the reference's largest SPD)
    A = rs.Sprs()
    A.load("/root/reference/tests/assets/cholsol_7.sprs")
    s = schol(A, 0)
    c = ops.symperm(A, s.pinv)
    Lp, Li, Lx = native.chol_numeric(
        A.n, c.p, c.i[: c.nnz()], c.x[: c.nnz()], s.parent, s.cp)
    L = Sprs(len(Lx), A.n, A.n, Lp, Li, Lx)
    report["sptrsv_cholsol7_L"] = sptrsv_model(L, Ds)

    # SpTRSV on a big banded L (chol of a 512^2-grid Laplacian): model
    # where the >=80% target holds
    a = laplacian(512)
    s2 = schol(a, 0)
    c2 = ops.symperm(a, s2.pinv)
    Lp2, Li2, Lx2 = native.chol_numeric(
        a.n, c2.p, c2.i[: c2.nnz()], c2.x[: c2.nnz()], s2.parent, s2.cp)
    L2 = Sprs(len(Lx2), a.n, a.n, Lp2, Li2, Lx2)
    report["sptrsv_laplacian512_L"] = sptrsv_model(L2, Ds)

    with open("SCALING_r05_model.json", "w") as f:
        json.dump(report, f, indent=1)
    for k, v in report.items():
        if k == "assumptions":
            continue
        print(k, json.dumps(v.get("per_D", v)))


if __name__ == "__main__":
    main()
