"""Probe: GROUPED manual-DMA farrow contraction for heavy downsampling.

At L/M ~ 230 (367500->1601) the farrow plan degenerates to q=1 — one
output per block — and the DMA farrow kernel is gated off (one-row dots,
q % 8 != 0).  The XLA form materializes ``region`` (the whole consumed
span, ~4500 rows x R) plus K stacked ``[w_blk, R]`` block slices before
the batched matmul; the round-3 capacity probe showed this scales
SUPERLINEARLY badly with input_capacity, which is why the heavy bench
is stuck at ~83 out-Msps (0.61x) on a 4096-frame chunk.

Idea: fuse G consecutive q-blocks into ONE DMA + ONE dot.  Group g's
8 outputs (q=1, G=8) span rows [block_base[8g], block_base[8g]+s0_7 +
w_blk) — a union of ~G*L/M + taps rows, read ONCE per group straight
from the HBM ring buffer.  The per-row placement inside the group is
almost static: with s0_j = floor(j*q*L/M),

    off(g, j) = block_base[Gg+j] - block_base[Gg] = s0_j + e(g, j),
    e(g, j) in {0, 1}                (floor identity),

so row j's small [w_blk] weight row is placed at STATIC column s0_j and
the residual e (static, precomputable) + the group's DMA alignment
remainder (traced, in [0,8)) fold into the positioning one-hot exactly
like the ungrouped DMA form's rem trick.  The kernel is then literally
``dma_farrow_contract`` with q_eff = G*q = 8 and block_base = group
bases — no new Mosaic code.

Usage: python experiments/farrow_group_dma_probe.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from resampler_tpu.engine import fir as fe  # noqa: E402
from resampler_tpu.ops.fir_dma_kernel import (  # noqa: E402
    dma_farrow_contract,
    dma_farrow_contract_packed,
)
from resampler_tpu.types import Attenuation, Latency, reduce_ratio  # noqa: E402

IN_HZ, OUT_HZ = 367500, 1601
TAPS = Latency.Sample64.taps


def build(B=1024, C=2, capacity=4096):
    L, M = reduce_ratio(IN_HZ, OUT_HZ)
    cfg = fe.FirConfig(
        channels=C, taps=TAPS, ratio_num=L, ratio_den=M,
        input_capacity=capacity,
    )
    cutoff = fe.fir_cutoff(TAPS, Attenuation.Db90, IN_HZ / OUT_HZ)
    coeffs = fe.fir_coefficients(TAPS, Attenuation.Db90, cutoff)
    fp = fe._farrow_tm_plan(cfg, coeffs)
    R = B * C
    ring = -(-(cfg.input_capacity + cfg.read_slack + 16 * 4096) // 256) * 256
    return cfg, coeffs, fp, R, ring


def make_xla(cfg, fp, R):
    """Production XLA farrow contraction (engine/fir.py _contract_farrow,
    int32 schedule), kept in sync manually."""
    M_ = cfg.ratio_den
    j_loc_c = jnp.asarray(fp["j_loc"])
    s_c = jnp.asarray(fp["s_pad"].astype(np.int32))
    ashift2_c = jnp.asarray(fp["ashift2"])
    q, K = fp["q"], fp["K"]
    n_jl, w_blk, d1 = fp["n_jl"], fp["w_blk"], fp["d1"]
    region_rows = fp["region_rows"]
    out_cap = cfg.out_capacity

    def contract(buffer, base, r):
        region = jax.lax.dynamic_slice(buffer, (base, 0), (region_rows, R))
        region_blk = jnp.stack(
            [
                jax.lax.slice_in_dim(region, int(b), int(b) + w_blk, axis=0)
                for b in fp["block_base"]
            ],
            axis=0,
        )
        wrap = (r + s_c >= jnp.int32(M_)).astype(jnp.int32)
        frac = (r + s_c - jnp.int32(M_) * wrap).astype(jnp.float32) / float(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        t_cheb = jnp.stack(ts, axis=-1)
        jl = j_loc_c + wrap
        onehot = (
            jl[:, :, None] == jnp.arange(n_jl, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        p_mat = (t_cheb[:, :, :, None] * onehot[:, :, None, :]).reshape(
            fp["n_pad"], d1 * n_jl
        )
        a_blk = jnp.einsum(
            "np,pw->nw", p_mat, ashift2_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(K, q, w_blk)
        out = jnp.einsum(
            "kqw,kwr->kqr", a_blk, region_blk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(fp["n_pad"], R)[:out_cap]

    return contract


def grouped_plan(cfg, fp, G):
    """Static grouped geometry: pads K to a multiple of G, computes group
    bases, static in-group placement columns s0_j, and the residual
    e(g, j) folded into j_loc."""
    L_, M_ = cfg.ratio_num, cfg.ratio_den
    q, K = fp["q"], fp["K"]
    taps = cfg.taps
    d1 = fp["d1"]
    Kg = -(-K // G)
    Kp = Kg * G
    # pad by CONTINUING the floor sequence (repeating the last block
    # breaks the floor identity below; continued outputs are discarded
    # by [:out_cap], their rows only cost DMA width already paid).
    # Wide configs clamp j at cap+2 exactly like _farrow_tm_plan —
    # clamped lanes can never be emitted, so their clipped e is harmless.
    i = np.arange(Kp * q, dtype=np.int64)
    j_ext = (i * L_) // M_
    if cfg.wide:
        j_ext = np.minimum(j_ext, cfg.input_capacity + 2)
    s_pad = ((i * L_) % M_).reshape(Kp, q)
    bb = j_ext.reshape(Kp, q)[:, 0]
    j_loc = (j_ext.reshape(Kp, q) - bb[:, None])
    assert (bb[:K] == fp["block_base"]).all()
    group_base = bb.reshape(Kg, G)[:, 0]                      # [Kg]
    s0 = np.array(
        [(j * q * L_) // M_ for j in range(G)], np.int64
    )                                                          # [G]
    # floor identity: floor(a+b) - floor(a) - floor(b) in {0, 1};
    # exact below the wide clamp, clipped (non-emittable lanes) above it
    e = bb.reshape(Kg, G) - group_base[:, None] - s0[None, :]  # [Kg, G]
    unclamped = bb.reshape(Kg, G) < cfg.input_capacity + 2 - 1
    assert e[unclamped].size == 0 or (
        e[unclamped].min() >= 0 and e[unclamped].max() <= 1
    ), (e[unclamped].min(), e[unclamped].max())
    e = np.clip(e, 0, 1)
    j_loc_g = np.clip(
        (j_loc.reshape(Kg, G, q) + e[:, :, None]).reshape(Kp, q),
        0, None,
    ).astype(np.int32)
    widen = 8 + int(e.max())  # alignment remainder + floor residual
    n_jl = int(j_loc_g.max()) + 2 + widen
    w_blk = n_jl - 1 + taps
    w_grp = int(s0[-1]) + w_blk
    w_dma = -(-w_grp // 8) * 8
    A, _ = fe.farrow_matrix(None if False else _coeffs(cfg), fe.FARROW_DEGREE)
    ashift2 = np.zeros((d1 * n_jl, w_blk), np.float32)
    for d in range(d1):
        for j in range(n_jl):
            ashift2[d * n_jl + j, j : j + taps] = A[d]
    return dict(
        G=G, Kg=Kg, Kp=Kp, q=q, d1=d1, n_jl=n_jl, w_blk=w_blk,
        w_dma=w_dma, s0=s0, group_base=group_base.astype(np.int64),
        group_base_rep=np.repeat(group_base, G).astype(np.int64),
        j_loc=j_loc_g, s_pad=s_pad, ashift2=ashift2,
        region_rows=int(group_base.max()) + w_dma + 8,
    )


def _coeffs(cfg):
    cutoff = fe.fir_cutoff(cfg.taps, Attenuation.Db90, IN_HZ / OUT_HZ)
    return fe.fir_coefficients(cfg.taps, Attenuation.Db90, cutoff)


def make_group_dma(cfg, fp, R, G=8, interpret=False):
    M_ = cfg.ratio_den
    gp = grouped_plan(cfg, fp, G)
    q, d1, n_jl = gp["q"], gp["d1"], gp["n_jl"]
    Kg, Kp = gp["Kg"], gp["Kp"]
    w_blk, w_dma = gp["w_blk"], gp["w_dma"]
    j_loc_c = jnp.asarray(gp["j_loc"])
    s_c = jnp.asarray(gp["s_pad"].astype(np.int32))
    ashift2_c = jnp.asarray(gp["ashift2"])
    gb_rep_c = jnp.asarray(gp["group_base_rep"].astype(np.int32))
    gb_c = jnp.asarray(gp["group_base"].astype(np.int32))
    s0 = [int(v) for v in gp["s0"]]
    out_cap = cfg.out_capacity

    def contract(buffer, base, r):
        wrap = (r + s_c >= jnp.int32(M_)).astype(jnp.int32)
        frac = (r + s_c - jnp.int32(M_) * wrap).astype(jnp.float32) / float(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        t_cheb = jnp.stack(ts, axis=-1)                        # [Kp, q, d1]
        # per-GROUP alignment remainder, broadcast to its blocks
        rem = ((base + gb_rep_c) % 8).astype(jnp.int32)        # [Kp]
        jl = j_loc_c + wrap + rem[:, None]
        onehot = (
            jl[:, :, None] == jnp.arange(n_jl, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        p_mat = (t_cheb[:, :, :, None] * onehot[:, :, None, :]).reshape(
            Kp * q, d1 * n_jl
        )
        a_blk = jnp.einsum(
            "np,pw->nw", p_mat, ashift2_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Kg, G, q, w_blk)
        # static in-group placement: row (j, l) lives at columns
        # [s0_j, s0_j + w_blk) of the group's w_dma-wide aligned read
        W = jnp.concatenate(
            [
                jnp.pad(
                    a_blk[:, j], ((0, 0), (0, 0), (s0[j], w_dma - s0[j] - w_blk))
                )
                for j in range(G)
            ],
            axis=1,
        )  # [Kg, G*q, w_dma]
        out = dma_farrow_contract(
            buffer, base, W, gb_c, interpret=interpret
        )  # [Kg, G*q, R]
        return out.reshape(Kp * q, R)[:out_cap]

    return contract


def make_packed_dma(cfg, fp, R, G=8, interpret=False):
    """PACKED grouped form: G per-block sub-DMAs per grid step, one
    block-diagonal dot.  No union span: reads only ~taps rows per
    output, padding repeats the last block (no floor identity needed),
    VMEM footprint independent of L/M."""
    M_ = cfg.ratio_den
    q, K = fp["q"], fp["K"]
    taps, d1 = cfg.taps, fp["d1"]
    Kg = -(-K // G)
    Kp = Kg * G
    bb = np.concatenate(
        [fp["block_base"], np.full(Kp - K, fp["block_base"][-1], np.int64)]
    )
    j_loc = np.concatenate(
        [fp["j_loc"], np.repeat(fp["j_loc"][-1:], Kp - K, axis=0)]
    )
    s_pad = np.concatenate(
        [fp["s_pad"], np.repeat(fp["s_pad"][-1:], Kp - K, axis=0)]
    )
    widen = 8
    n_jl = int(j_loc.max()) + 2 + widen
    w_blk = n_jl - 1 + taps
    s_sub = -(-w_blk // 8) * 8
    A, _ = fe.farrow_matrix(_coeffs(cfg), fe.FARROW_DEGREE)
    ashift2 = np.zeros((d1 * n_jl, w_blk), np.float32)
    for d in range(d1):
        for j in range(n_jl):
            ashift2[d * n_jl + j, j : j + taps] = A[d]
    j_loc_c = jnp.asarray(j_loc.astype(np.int32))
    s_c = jnp.asarray(s_pad.astype(np.int32))
    ashift2_c = jnp.asarray(ashift2)
    bb_c = jnp.asarray(bb.astype(np.int32))
    out_cap = cfg.out_capacity

    def contract(buffer, base, r):
        wrap = (r + s_c >= jnp.int32(M_)).astype(jnp.int32)
        frac = (r + s_c - jnp.int32(M_) * wrap).astype(jnp.float32) / float(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        t_cheb = jnp.stack(ts, axis=-1)
        rem = ((base + bb_c) % 8).astype(jnp.int32)            # [Kp]
        jl = j_loc_c + wrap + rem[:, None]
        onehot = (
            jl[:, :, None] == jnp.arange(n_jl, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        p_mat = (t_cheb[:, :, :, None] * onehot[:, :, None, :]).reshape(
            Kp * q, d1 * n_jl
        )
        a_blk = jnp.einsum(
            "np,pw->nw", p_mat, ashift2_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Kg, G, q, w_blk)
        W = jnp.concatenate(
            [
                jnp.pad(
                    a_blk[:, j],
                    (
                        (0, 0),
                        (0, 0),
                        (j * s_sub, (G - j) * s_sub - w_blk),
                    ),
                )
                for j in range(G)
            ],
            axis=1,
        )  # [Kg, G*q, G*s_sub]
        out = dma_farrow_contract_packed(
            buffer, base, W, bb_c, G=G, s_sub=s_sub, interpret=interpret
        )
        return out.reshape(Kp * q, R)[:out_cap]

    return contract


def run_capacity(pr, capacity):
    cfg, coeffs, fp, R, ring = build(capacity=capacity)
    L_, M_ = cfg.ratio_num, cfg.ratio_den
    pr(
        f"\n== capacity {capacity} (wide={cfg.wide}): q={fp['q']} "
        f"K={fp['K']} out_cap={cfg.out_capacity} w_blk={fp['w_blk']} R={R}"
    )
    gp = grouped_plan(cfg, fp, 8)
    pr(
        f"grouped: Kg={gp['Kg']} w_dma={gp['w_dma']} "
        f"scratch={2 * gp['w_dma'] * R * 4 / 1e6:.1f} MB "
        f"region_rows={gp['region_rows']} (slack {cfg.read_slack})"
    )
    forms = {
        "xla": make_xla(cfg, fp, R),
        "dma-union": make_group_dma(cfg, fp, R, G=8),
        "dma-packed": make_packed_dma(cfg, fp, R, G=8),
    }
    rng = np.random.default_rng(0)
    buffer = jnp.asarray(rng.standard_normal((ring, R)), jnp.float32)

    # only lanes with an unclamped, in-buffer tap window are meaningful
    j_real = (np.arange(cfg.out_capacity, dtype=np.int64) * L_) // M_
    n_safe = int((j_real < capacity - cfg.taps).sum())

    ref = np.asarray(
        jax.jit(forms["xla"])(buffer, jnp.int32(1234), jnp.int32(777))
    )
    for name in ("dma-union", "dma-packed"):
        got = np.asarray(
            jax.jit(forms[name])(buffer, jnp.int32(1234), jnp.int32(777))
        )
        d = np.abs(got[:n_safe] - ref[:n_safe]).max()
        pr(f"max |{name} - xla| over {n_safe} lanes = {d:.2e}")
        assert d < 1e-4, d

    J = 32

    @functools.partial(jax.jit, static_argnames=("mode",))
    def scan_many(buffer, *, mode):
        def body(carry, j):
            base = (j * 97) % 3000
            r = (j * 131) % cfg.ratio_den
            out = forms[mode](buffer, base, r)
            return carry + jnp.max(jnp.abs(out)), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(J, dtype=jnp.int32)
        )
        return acc

    def time_fn(fn, *args, reps=4, warmup=2):
        for _ in range(warmup):
            res = fn(*args)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = fn(*args)
        jax.block_until_ready(res)
        return (time.perf_counter() - t0) / reps

    out_samples = cfg.out_capacity * R
    for mode in forms:
        t = time_fn(lambda b, _m=mode: scan_many(b, mode=_m), buffer)
        pr(
            f"{mode}: {t*1e3/J:.3f} ms/contraction = "
            f"{J*out_samples/t/1e6:.1f} out-Msps (contraction-only)"
        )


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    for capacity in (4096, 8192, 16384, 32768):
        run_capacity(pr, capacity)


if __name__ == "__main__":
    main()
