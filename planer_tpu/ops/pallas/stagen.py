"""Pallas fused ResNet body stages: basic + bottleneck residual blocks.

Generalizes the stage64 entry kernel (see ops/pallas/stage64.py for the
layout rationale) to the C>=128 stages of ResNet-18/34 and the bottleneck
stages of ResNet-50 — the reference runs every one of these convs through
the same threaded im2col + BLAS path (/root/reference/planer/util.py:17-44);
XLA runs the 1x1 projections at <20% MXU and pays an HBM round trip per op.

One ``stagen`` op = one ResNet stage: an optional strided/projected entry
block followed by identity blocks, all with the SAME (cmid, cout).  The
kernel runs the whole stage per grid step with activations in VMEM:

  * activations: (C, flat) int8, spatial flattened rows padded to an RS
    stride (R data cols + zeros) with 128-lane halos — identical layout
    family to stage64, so every 3x3 tap is a lane-offset slice;
  * stride-2 entry: the input is 2x2 space-to-depth'd by the XLA prologue
    into 4 phase planes stacked on sublanes; the strided 3x3 becomes 9
    phase-tagged taps (phase (dy&1, dx&1), lane offset only for the -1
    taps) and the 1x1 projection is a single K=cin dot on phase (0, 0) —
    no strided vector access anywhere;
  * bottleneck blocks: 1x1 -> 3x3 -> 1x1 chains are K=cin / 9xK=cmid /
    K=cmid dot sequences sharing the scratch ping-pong; the projection
    residual is requantized to int8 once per block (symmetric [-127, 127],
    it is pre-ReLU) so only one int32 accumulator is ever live;
  * epilogues: folded single-affine + clip(0|-127, 127) + round + mask, as
    in stage64.

Everything falls back to the decomposed jnp chain off-TPU / under sharding
(force_decomposed) / for unsupported geometry, with FALLOFF counting why.

**Measured result (negative — this op is OPT-IN, see net.quantize(fuse=)):**
on real TPU the fused body stages LOSE to XLA's W8A8 convs end-to-end
(experiments/fuse_ab_resnet18_b64.json: stage64-only 2.03 ms vs +stagen-l2
2.16 / full 2.34; fuse_ab_resnet50_b32.json: stem-only 2.16 vs +l1 2.39).
Cause: the requant epilogue is VPU work scaling with C x S per conv; at
C >= 128 XLA's per-conv kernels already keep the MXU fed and the epilogue
fusion saving no longer covers the Pallas kernels' weaker HBM pipelining.
Kept as a complete, parity-tested implementation because (a) it documents
the measured design boundary of whole-stage fusion, and (b) geometries with
cheap epilogues (small C, large S — exactly stage64's regime) do win.
"""
from __future__ import annotations

import collections
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..qtypes import QTensor
from . import stage64 as _s64

__all__ = ["stagen", "decomposed", "PALLAS", "FALLOFF"]

PALLAS = "auto"
FALLOFF = collections.Counter()

HALO = _s64.HALO


# --------------------------------------------------------------------------
# block plan parsing (shared by pallas, decomposed, fuse pass, calibration)
# --------------------------------------------------------------------------

def parse_blocks(blocks, w):
    """Split the flat weight list into per-block dicts.

    ``blocks``: list of {"kind": "basic"|"bottleneck", "stride": 1|2,
    "down": bool} (JSON round-trippable IR kwarg).  ``w``: flat
    [W1, B1, W2, B2, (W3, B3), (Wd, Bd)] x blocks."""
    out, i = [], 0
    for b in blocks:
        d = dict(b)
        n = 6 if b["kind"] == "bottleneck" else 4
        d["convs"] = [(w[i + 2 * k], w[i + 2 * k + 1]) for k in range(n // 2)]
        i += n
        if b.get("down"):
            d["proj"] = (w[i], w[i + 1])
            i += 2
        out.append(d)
    if i != len(w):
        raise ValueError(f"stagen: {len(w)} weights != plan {blocks}")
    return out


def decomposed(x, *w, blocks=None, jops=None):
    """Reference semantics: exactly the op chain the fusion replaced."""
    if jops is None:
        from .. import jax_ops as jops
    for b in parse_blocks(blocks, w):
        st = int(b.get("stride", 1))
        res = x
        if b["kind"] == "basic":
            (W1, B1), (W2, B2) = b["convs"]
            y = jops.relu(jops.conv2d(x, W1, B1, strides=(st, st),
                                      pads=(1, 1, 1, 1)))
            y = jops.conv2d(y, W2, B2, strides=(1, 1), pads=(1, 1, 1, 1))
        else:
            (W1, B1), (W2, B2), (W3, B3) = b["convs"]
            y = jops.relu(jops.conv2d(x, W1, B1, strides=(1, 1)))
            y = jops.relu(jops.conv2d(y, W2, B2, strides=(st, st),
                                      pads=(1, 1, 1, 1)))
            y = jops.conv2d(y, W3, B3, strides=(1, 1))
        if b.get("down"):
            Wd, Bd = b["proj"]
            res = jops.conv2d(res, Wd, Bd, strides=(st, st))
        x = jops.relu(jops.add(y, res))
    return x


# --------------------------------------------------------------------------
# weight packing
# --------------------------------------------------------------------------

def _pack3x3(wq):
    """(O, C, 3, 3) -> (O, 9*C): A[o, t*C + c] = w[o, c, dy, dx]."""
    o, c = wq.shape[0], wq.shape[1]
    return wq.transpose(0, 2, 3, 1).reshape(o, 9 * c)


def _pack1x1(wq):
    return wq.reshape(wq.shape[0], wq.shape[1])


# stride-2 3x3 tap -> (phase block p, lane offset builder): output (r, c)
# reads input (2r+dy', 2c+dx'); phase (py, px) = (dy'&1, dx'&1), row/col
# shift -1 exactly for dy'/dx' == -1
def _s2d_taps(RS):
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            p = 2 * (dy & 1) + (dx & 1)
            off = (-RS if dy == -1 else 0) + (-1 if dx == -1 else 0)
            taps.append((p, off))
    return taps


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _requant_i8(acc, f_ref, b_ref, m8, lo):
    """acc (C, S) s32 -> int8 plane via the trunc-fold requant
    (experiments/epilogue_probe.json): the bias carries a pre-folded +0.5,
    f32->int8 conversion truncates (== round-half-up for v >= 0), pads are
    zeroed by an int8 AND.  ``lo`` = 0 for post-ReLU planes; -127 for the
    pre-ReLU residual, which floors explicitly (truncation rounds negatives
    the wrong way)."""
    v = acc.astype(jnp.float32) * f_ref[...] + b_ref[...]
    if lo == 0:
        return jnp.clip(v, 0.0, 127.99).astype(jnp.int8) & m8
    return jnp.clip(jnp.floor(v), float(lo), 127.0).astype(jnp.int8) & m8


def _stagen_kernel(*refs, g, plan, ipr):
    """One grid step = ``ipr`` images through every block of the stage.

    ``plan``: static list of per-block descriptors built by _build_plan:
    each names its A/f/b ref indices, tap tables, source/dest scratch ids,
    and static residual scale.  refs = [mask, x, <weights...>, out,
    <scratch...>]."""
    import jax.experimental.pallas as pl

    mask_ref, x_ref = refs[0], refs[1]
    nw = plan["n_weight_refs"]
    w = refs[2:2 + nw]
    o_ref = refs[2 + nw]
    scr = refs[3 + nw:]
    Sg, RSg = g.S, g.RS

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for sc in scr:
            z = jnp.zeros((sc.shape[0], HALO), jnp.int8)
            sc[:, :HALO] = z
            sc[:, HALO + Sg:] = z

    m = mask_ref[...]              # (1, S) int8: -1 at data cols, 0 at pads
    cond = m != 0

    def dot(A_ref, cols, src, off):
        return jnp.dot(A_ref[:, cols[0]:cols[1]],
                       src[:, HALO + off:HALO + off + Sg],
                       preferred_element_type=jnp.int32)

    def conv3(A_ref, src_ref, cin, taps):
        acc = None
        for t, (p, off) in enumerate(taps):
            d = dot(A_ref, (t * cin, (t + 1) * cin),
                    src_ref[p * cin:(p + 1) * cin] if p is not None
                    else src_ref, off)
            acc = d if acc is None else acc + d
        return acc

    for p in range(ipr):
        def buf(sid):
            if sid == "x":
                return x_ref[p] if ipr > 1 or x_ref.ndim == 3 else x_ref
            return scr[sid]

        cur = "x"
        for bi, blk in enumerate(plan["blocks"]):
            last = bi == len(plan["blocks"]) - 1
            cin, cmid, cout = blk["cin"], blk["cmid"], blk["cout"]
            A = [w[i] for i in blk["A"]]
            F = [w[i] for i in blk["f"]]
            B = [w[i] for i in blk["b"]]

            # residual first: one int32 accumulator live at a time
            if blk["down"]:
                accp = dot(A[-1], (0, cin), buf(cur)[:cin] if blk["s2d"]
                           else buf(cur), 0)
                buf(blk["res"])[:, HALO:HALO + Sg] = _requant_i8(
                    accp, F[-1], B[-1], m, -127)
                res_src, res_scale = blk["res"], blk["sx_res"]
            else:
                res_src, res_scale = cur, blk["sx_res"]
            res = buf(res_src)[:, HALO:HALO + Sg]

            if blk["kind"] == "basic":
                taps1 = (_s2d_taps(RSg) if blk["s2d"]
                         else [(None, o) for o in blk["taps"]])
                a1 = conv3(A[0], buf(cur), cin, taps1)
                buf(blk["t1"])[:, HALO:HALO + Sg] = _requant_i8(
                    a1, F[0], B[0], m, 0)
                a2 = conv3(A[1], buf(blk["t1"]), cout,
                           [(None, o) for o in blk["taps"]])
                fin, bfin = F[1], B[1]
            else:
                if blk["s2d"]:
                    # 1x1 on the 2R grid = per-phase K=cin dots into the
                    # phase-stacked t1 buffer; the strided 3x3 then reads
                    # phase-tagged taps from it
                    for ph in range(4):
                        a1 = dot(A[0], (0, cin),
                                 buf(cur)[ph * cin:(ph + 1) * cin], 0)
                        buf(blk["t1"])[ph * cmid:(ph + 1) * cmid,
                                       HALO:HALO + Sg] = _requant_i8(
                            a1, F[0], B[0], m, 0)
                    a2 = conv3(A[1], buf(blk["t1"]), cmid, _s2d_taps(RSg))
                else:
                    a1 = dot(A[0], (0, cin), buf(cur), 0)
                    buf(blk["t1"])[:, HALO:HALO + Sg] = _requant_i8(
                        a1, F[0], B[0], m, 0)
                    a2 = conv3(A[1], buf(blk["t1"]), cmid,
                               [(None, o) for o in blk["taps"]])
                buf(blk["t2"])[:, HALO:HALO + Sg] = _requant_i8(
                    a2, F[1], B[1], m, 0)
                a2 = dot(A[2], (0, cmid), buf(blk["t2"]), 0)
                fin, bfin = F[2], B[2]

            v = (a2.astype(jnp.float32) * fin[...] + bfin[...]
                 + res.astype(jnp.float32) * res_scale)
            if last:
                o_ref[p, :, HALO:HALO + Sg] = jnp.where(
                    cond, jnp.maximum(v, 0.0), 0.0).astype(o_ref.dtype)
            else:
                buf(blk["y"])[:, HALO:HALO + Sg] = \
                    jnp.clip(v, 0.0, 127.99).astype(jnp.int8) & m
                cur = blk["y"]


# --------------------------------------------------------------------------
# plan building + pallas_call wrapper
# --------------------------------------------------------------------------

def _geometry(Rout):
    if Rout < 7:
        return None
    g = _s64._Geo(Rout)
    if g.S > _s64._S_MAX or g.RS + 1 > HALO:
        return None
    # the RS row padding is dead lanes in every dot AND every epilogue op:
    # past ~35% waste (R=14 -> RS=64 is 4.6x) XLA's plain W8A8 convs win,
    # so small grids (ResNet l3/l4) stay on the decomposed path
    if g.RS > 1.35 * g.R:
        return None
    return g


def _fold(W, num, den=1.0):
    return W.scale.reshape(-1, 1).astype(jnp.float32) * float(num / den)


def _bias(Bv, c, scale):
    v = (jnp.zeros((c,), jnp.float32) if Bv is None
         else jnp.asarray(Bv).reshape(-1).astype(jnp.float32))
    return (v * float(scale)).reshape(c, 1)


def _build(x, w, blocks, g, interpret):
    """Fold scales, pack A matrices, allocate scratch, build the plan."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    parsed = parse_blocks(blocks, w)
    s2d = parsed[0].get("stride", 1) == 2
    s_in = float(parsed[0]["convs"][0][0].act_scale)

    weights = []       # flat jnp arrays passed to the kernel
    scratch = []       # shapes (C, BUF) int8
    plan_blocks = []
    taps3 = [(dy - 1) * g.RS + (dx - 1) for dy in range(3) for dx in range(3)]

    def add_w(a):
        weights.append(a)
        return len(weights) - 1

    def add_scratch(c):
        scratch.append(c)
        return len(scratch) - 1

    # scratch ids are reused across blocks via a tiny pool keyed by height
    pool: dict[int, list[int]] = {}

    def get_buf(c, exclude=()):
        for sid in pool.get(c, []):
            if sid not in exclude:
                return sid
        sid = add_scratch(c)
        pool.setdefault(c, []).append(sid)
        return sid

    cur_scale = s_in
    cur_buf = "x"
    for bi, b in enumerate(parsed):
        last = bi == len(parsed) - 1
        kind = b["kind"]
        convs = b["convs"]
        W1 = convs[0][0]
        cin = W1.q.shape[1]
        cout = convs[-1][0].q.shape[0]
        cmid = convs[1][0].q.shape[0] if kind == "bottleneck" else cout
        blk_s2d = s2d and bi == 0
        nxt = (1.0 if last
               else 1.0 / float(parsed[bi + 1]["convs"][0][0].act_scale))
        pb = {"kind": kind, "cin": cin, "cmid": cmid, "cout": cout,
              "down": bool(b.get("down")), "s2d": blk_s2d, "taps": taps3,
              "A": [], "f": [], "b": []}

        # +0.5 pre-folded into every QUANTIZING bias (trunc-fold requant;
        # the last block's final bias stays raw for the bf16 out)
        h = 0.5
        hf = 0.0 if last else 0.5
        if kind == "basic":
            (W1, B1), (W2, B2) = convs
            s_m = float(W2.act_scale)
            pb["A"].append(add_w(_pack3x3(W1.q)))
            pb["f"].append(add_w(_fold(W1, cur_scale, s_m)))
            pb["b"].append(add_w(_bias(B1, cout, 1.0 / s_m) + h))
            pb["A"].append(add_w(_pack3x3(W2.q)))
            pb["f"].append(add_w(_fold(W2, s_m * nxt)))
            pb["b"].append(add_w(_bias(B2, cout, nxt) + hf))
            pb["t1"] = get_buf(cout)
        else:
            (W1, B1), (W2, B2), (W3, B3) = convs
            s1, s2 = float(W2.act_scale), float(W3.act_scale)
            pb["A"].append(add_w(_pack1x1(W1.q)))
            pb["f"].append(add_w(_fold(W1, cur_scale, s1)))
            pb["b"].append(add_w(_bias(B1, cmid, 1.0 / s1) + h))
            pb["A"].append(add_w(_pack3x3(W2.q)))
            pb["f"].append(add_w(_fold(W2, s1, s2)))
            pb["b"].append(add_w(_bias(B2, cmid, 1.0 / s2) + h))
            pb["A"].append(add_w(_pack1x1(W3.q)))
            pb["f"].append(add_w(_fold(W3, s2 * nxt)))
            pb["b"].append(add_w(_bias(B3, cout, nxt) + hf))
            pb["t1"] = get_buf(4 * cmid if blk_s2d else cmid)
            pb["t2"] = get_buf(cmid, exclude=(pb["t1"],))

        if b.get("down"):
            Wd, Bd = b["proj"]
            # residual requantized once to int8 at its own scale: symmetric
            # max|v| estimate = 127 * max per-channel scale * s_in keeps the
            # clip rare; it is pre-ReLU so lo = -127 (explicit floor; +0.5
            # folded => floor == round-half-up)
            s_res = float(np.asarray(Wd.scale).max()) * cur_scale
            pb["A"].append(add_w(_pack1x1(Wd.q)))
            pb["f"].append(add_w(_fold(Wd, cur_scale, s_res)))
            pb["b"].append(add_w(_bias(Bd, cout, 1.0 / s_res) + 0.5))
            pb["res"] = get_buf(cout, exclude=(pb["t1"],
                                               pb.get("t2", -1)))
            pb["sx_res"] = s_res * nxt
        else:
            pb["sx_res"] = cur_scale * nxt

        if not last:
            ex = (pb["t1"], pb.get("t2", -1), pb.get("res", -1))
            # the residual read must survive until after the final conv:
            # never write the block output over its own input buffer unless
            # that input is not this block's residual source (it always is
            # for identity blocks) -> take a distinct buffer
            ex = ex + ((cur_buf,) if cur_buf != "x" else ())
            pb["y"] = get_buf(cout, exclude=ex)
            cur_buf = pb["y"]
        cur_scale = (1.0 if last
                     else float(parsed[bi + 1]["convs"][0][0].act_scale))
        plan_blocks.append(pb)

    plan = {"blocks": plan_blocks, "n_weight_refs": len(weights) + 0}
    return weights, scratch, plan, s_in, s2d


def _prologue(x, s_in, g, s2d):
    """Quantize + lay out (N, C, H, H) -> (N, C_eff, BUF) int8 with zero
    halos and row pads (C_eff = 4C phase-stacked for stride-2 entries)."""
    n, c, H = x.shape[0], x.shape[1], x.shape[-1]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127
                  ).astype(jnp.int8)
    if s2d:
        xq = xq.reshape(n, c, g.R, 2, g.R, 2).transpose(0, 3, 5, 1, 2, 4)
        xq = xq.reshape(n, 4 * c, g.R, g.R)
        c = 4 * c
    xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, g.RS - g.R)))
    xq = xq.reshape(n, c, g.S)
    return jnp.pad(xq, ((0, 0), (0, 0), (HALO, HALO)))


def _pallas_stage(x, w, blocks, g, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    weights, scratch, plan, s_in, s2d = _build(x, w, blocks, g, interpret)
    xb = _prologue(x, s_in, g, s2d)
    N = x.shape[0]
    cout = plan["blocks"][-1]["cout"]
    ipr = 2 if (N % 2 == 0 and g.S <= 1536) else 1

    const = lambda shape: pl.BlockSpec(shape, lambda n: (0,) * len(shape))
    in_specs = [const((1, g.S)),
                pl.BlockSpec((ipr,) + xb.shape[1:], lambda n: (n, 0, 0))]
    in_specs += [const(a.shape) for a in weights]
    flops = 0
    for pb in plan["blocks"]:
        k = {"basic": 9 * pb["cin"] * pb["cout"] + 9 * pb["cout"] ** 2,
             "bottleneck": pb["cin"] * pb["cmid"] * (4 if pb["s2d"] else 1)
             + 9 * pb["cmid"] ** 2 + pb["cmid"] * pb["cout"]}[pb["kind"]]
        if pb["down"]:
            k += pb["cin"] * pb["cout"]
        flops += 2 * k * g.S
    y = pl.pallas_call(
        partial(_stagen_kernel, g=g, plan=plan, ipr=ipr),
        grid=(N // ipr,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ipr, cout, g.BUF), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, cout, g.BUF), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((c, g.BUF), jnp.int8) for c in scratch],
        cost_estimate=pl.CostEstimate(
            flops=N * flops,
            bytes_accessed=N * (xb.shape[1] + 2 * cout) * g.BUF,
            transcendentals=0),
        interpret=interpret,
    )(_s64._colmask(g), xb, *weights)
    n = y.shape[0]
    y = y[:, :, HALO:HALO + g.S].reshape(n, cout, g.R, g.RS)[..., :g.R]
    return y.astype(x.dtype)


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

def _eligible(x, w, blocks):
    if not blocks or x.ndim != 4 or x.shape[2] != x.shape[3]:
        FALLOFF["shape"] += 1
        return None
    try:
        parsed = parse_blocks(blocks, w)
    except Exception:
        FALLOFF["weights"] += 1
        return None
    for b in parsed:
        for W, _ in b["convs"] + ([b["proj"]] if b.get("down") else []):
            if not (isinstance(W, QTensor) and W.act_scale is not None
                    and W.q.dtype == jnp.int8):
                FALLOFF["weights"] += 1
                return None
    st = int(parsed[0].get("stride", 1))
    H = x.shape[2]
    if H % st:
        FALLOFF["geometry"] += 1
        return None
    g = _geometry(H // st)
    if g is None:
        FALLOFF["geometry"] += 1
        return None
    # later blocks must be stride-1 identity at constant width
    c0 = parsed[0]["convs"][-1][0].q.shape[0]
    for b in parsed[1:]:
        if (int(b.get("stride", 1)) != 1 or b.get("down")
                or b["convs"][-1][0].q.shape[0] != c0):
            FALLOFF["structure"] += 1
            return None
    return g


def stagen(x, *w, blocks=None, interpret=None, force_decomposed=False):
    """Fused ResNet body stage (optional strided/projected entry block +
    identity blocks; basic or bottleneck).

    Positional inputs: x then per-block [W1, B1, W2, B2, (W3, B3),
    (Wd, Bd)] as described by the ``blocks`` IR kwarg (see parse_blocks).
    ``force_decomposed`` keeps the pallas_call out of GSPMD programs.
    """
    if force_decomposed:
        return decomposed(x, *w, blocks=blocks)
    use = PALLAS
    if use == "auto":
        try:
            use = jax.default_backend() == "tpu"
        except Exception:
            use = False
    if interpret is not None:
        use = True
    if use:
        g = _eligible(x, w, blocks)
        if g is not None:
            return _pallas_stage(x, list(w), blocks, g, bool(interpret))
    return decomposed(x, *w, blocks=blocks)
