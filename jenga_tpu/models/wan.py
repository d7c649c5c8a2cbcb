"""Wan2.1 DiT backbone, functional JAX with first-class token carving.

Re-design of the reference ``WanModel``
(`/root/reference/wan/modules/model_mul.py:394-654`): a single-stream DiT
(30 layers / dim 1536 for 1.3B, 40 / 5120 for 14B) where every block runs
self-attention (carved block-sparse over hilbert-ordered video tokens),
dense cross-attention over text, and a GELU MLP, all modulated by a 6-chunk
time embedding.

Differences from the reference, by design:
  * No monkey-patching / class-attribute state: the carving plan, RoPE
    tables and drop schedules arrive as an immutable ``WanCarve`` value and
    everything is a pure function of (params, inputs, spec).
  * The hilbert reorder is fused into the RoPE tables at trace time (the
    reference gathers ``freqs_i[freq_remap]`` per call,
    `/root/reference/wan/modules/model_mul.py:63-65`).
  * Patch embedding is a reshape+matmul, not a Conv3d, so the MXU sees one
    big GEMM.
  * Batched: the reference loops over per-sample lists; here cond/uncond
    ride one [2, ...] batch through a single kernel launch.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.flash_attention import attention_bshd
from ..parallel.ulysses import ulysses_self_attention
from ..sparse.planner import build_block_mask
from . import layers as L

__all__ = ["WanConfig", "WanCarve", "init_wan_params", "wan_forward",
           "wan_embed", "wan_trunk", "wan_head", "make_wan_carve",
           "wan_rope_tables", "WAN_T2V_1_3B", "WAN_T2V_14B", "WAN_I2V_14B"]


@dataclasses.dataclass(frozen=True)
class WanConfig:
    """Architecture hyperparameters (reference EasyDict configs,
    `/root/reference/wan/configs/wan_t2v_1_3B.py`, `wan_t2v_14B.py`)."""
    model_type: str = "t2v"
    patch_size: tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def rope_dims(self) -> tuple[int, int, int]:
        # real sub-dims per (t, h, w) axis; complex split is
        # [c - 2*(c//3), c//3, c//3] with c = head_dim // 2
        # (`/root/reference/wan/modules/model_mul.py:44`).
        c = self.head_dim // 2
        return (2 * (c - 2 * (c // 3)), 2 * (c // 3), 2 * (c // 3))


WAN_T2V_1_3B = WanConfig(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
WAN_T2V_14B = WanConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)
WAN_I2V_14B = dataclasses.replace(WAN_T2V_14B, model_type="i2v", in_dim=36)


@dataclasses.dataclass(frozen=True)
class WanCarve:
    """Static carving spec for one resolution stage.

    ``curve_order``/``inverse_order`` reorder padded tokens to/from curve
    order; ``rope_cos/rope_sin`` are already curve-permuted tables;
    ``block_neighbors`` feeds the planner; ``sa_drop_rate``/``p_remain``
    schedule the selection; drop<=0.25 falls back to dense attention
    (`/root/reference/wan/modules/model_mul.py:153-159`).
    """
    curve_order: np.ndarray         # [S_pad] int32
    inverse_order: np.ndarray       # [S_pad] int32
    block_neighbors: np.ndarray     # [nb, nb] bool
    rope_cos: np.ndarray            # [S_pad, head_dim//2] f32, curve order
    rope_sin: np.ndarray
    sa_drop_rate: float
    p_remain: float
    first_frame_blocks: int
    seqlen: int                     # real (unpadded) token count
    q_rows: int = 1                 # >1: shared-gather kernel (union list
                                    # per q_rows query blocks; wins with
                                    # real checkpoints' local attention)
    joint_sel: bool = False         # q_rows>1 only: joint group selection
                                    # (planner pools queries per group so
                                    # union == density; see HYCarve)
    sel_mask: object = None         # optional precomputed selection mask
                                    # ([B,H,nqb,nkb] bool, group-pooled
                                    # rows when joint_sel) — bypasses the
                                    # planner in every layer. For replaying
                                    # a recorded selection (curve_viz
                                    # triage) and planner-cost ablations
                                    # (tools/wan_trunk_ablate.py).


jax.tree_util.register_dataclass(
    WanCarve,
    data_fields=["curve_order", "inverse_order", "block_neighbors",
                 "rope_cos", "rope_sin", "sel_mask"],
    meta_fields=["sa_drop_rate", "p_remain", "first_frame_blocks",
                 "seqlen", "q_rows", "joint_sel"])


def wan_rope_tables(cfg: WanConfig, grid: tuple[int, int, int],
                    order: np.ndarray | None = None,
                    pad_to: int | None = None):
    """3-D RoPE tables for a latent token grid, optionally curve-permuted
    (the reference's ``freq_remap``) and padded with identity rotations to a
    block-multiple length."""
    cos, sin = L.rope_table_3d(grid, cfg.rope_dims, theta=10000.0,
                               order=order)
    if pad_to is not None and pad_to > cos.shape[0]:
        pad = pad_to - cos.shape[0]
        cos = np.concatenate([cos, np.ones((pad, cos.shape[1]), np.float32)])
        sin = np.concatenate([sin, np.zeros((pad, sin.shape[1]), np.float32)])
    return cos, sin


def make_wan_carve(cfg: WanConfig, plan, sa_drop_rate: float,
                   p_remain: float, q_rows: int = 1,
                   joint_sel: bool = False) -> WanCarve:
    """Assemble the per-stage carving spec from a ``CurvePlan``.

    ``first_frame_blocks = num_blocks // 21`` keeps the first-frame blocks
    mutually visible (`/root/reference/wan/modules/model_mul.py:164`).
    """
    if q_rows > 8 and not joint_sel:
        raise ValueError(
            f"q_rows={q_rows} requires joint selection (per-row membership "
            "words hold at most 8 rows; ops/block_sparse_attention.py)")
    s = plan.seq_len
    s_pad = -(-s // 128) * 128
    cos, sin = wan_rope_tables(cfg, plan.grid, order=plan.curve_order,
                               pad_to=s_pad)
    num_blocks = s_pad // 128
    # device arrays: numpy constants closed over by jit are embedded as
    # literal bytes in the HLO (blowing past compile-request limits);
    # device arrays are lifted to parameters.
    return WanCarve(
        curve_order=jnp.asarray(plan.curve_order),
        inverse_order=jnp.asarray(plan.linear_to_curve),
        block_neighbors=jnp.asarray(plan.block_neighbors),
        rope_cos=jnp.asarray(cos), rope_sin=jnp.asarray(sin),
        sa_drop_rate=float(sa_drop_rate), p_remain=float(p_remain),
        first_frame_blocks=num_blocks // 21,
        seqlen=s,
        q_rows=int(q_rows), joint_sel=bool(joint_sel))


def _linear_init(key, d_in, d_out, dtype, scale=None, zero=False, bias=True):
    p = {}
    if zero:
        p["w"] = jnp.zeros((d_in, d_out), dtype)
    else:
        bound = scale if scale is not None else math.sqrt(6.0 / (d_in + d_out))
        p["w"] = jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_wan_params(key, cfg: WanConfig):
    """Random init matching the reference's scheme (xavier linears, normal
    embeddings, zero head, `/root/reference/wan/modules/model_mul.py:633-654`).
    Real checkpoints come through ``jenga_tpu.convert``."""
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 16 + cfg.num_layers * 16))
    nk = lambda: next(keys)
    d, fd = cfg.dim, cfg.ffn_dim
    patch_in = cfg.in_dim * math.prod(cfg.patch_size)

    def block_params():
        p = {
            "self_attn": {
                "q": _linear_init(nk(), d, d, dtype),
                "k": _linear_init(nk(), d, d, dtype),
                "v": _linear_init(nk(), d, d, dtype),
                "o": _linear_init(nk(), d, d, dtype),
                "norm_q": jnp.ones((d,), jnp.float32),
                "norm_k": jnp.ones((d,), jnp.float32),
            },
            "cross_attn": {
                "q": _linear_init(nk(), d, d, dtype),
                "k": _linear_init(nk(), d, d, dtype),
                "v": _linear_init(nk(), d, d, dtype),
                "o": _linear_init(nk(), d, d, dtype),
                "norm_q": jnp.ones((d,), jnp.float32),
                "norm_k": jnp.ones((d,), jnp.float32),
            },
            "norm3": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            "ffn": {"fc1": _linear_init(nk(), d, fd, dtype),
                    "fc2": _linear_init(nk(), fd, d, dtype)},
            "modulation": jax.random.normal(nk(), (6, d), jnp.float32)
                          / d ** 0.5,
        }
        if cfg.model_type == "i2v":
            p["cross_attn"]["k_img"] = _linear_init(nk(), d, d, dtype)
            p["cross_attn"]["v_img"] = _linear_init(nk(), d, d, dtype)
            p["cross_attn"]["norm_k_img"] = jnp.ones((d,), jnp.float32)
        return p

    params = {
        "patch_embedding": _linear_init(nk(), patch_in, d, dtype),
        "text_embedding": {"fc1": _linear_init(nk(), cfg.text_dim, d, dtype),
                           "fc2": _linear_init(nk(), d, d, dtype)},
        "time_embedding": {"fc1": _linear_init(nk(), cfg.freq_dim, d,
                                               jnp.float32),
                           "fc2": _linear_init(nk(), d, d, jnp.float32)},
        "time_projection": _linear_init(nk(), d, 6 * d, jnp.float32),
        "blocks": [block_params() for _ in range(cfg.num_layers)],
        "head": {
            "norm": None,
            "linear": _linear_init(
                nk(), d, math.prod(cfg.patch_size) * cfg.out_dim, dtype,
                zero=True),
            "modulation": jax.random.normal(nk(), (2, d), jnp.float32)
                          / d ** 0.5,
        },
    }
    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "norm_in": {"w": jnp.ones((1280,), jnp.float32),
                        "b": jnp.zeros((1280,), jnp.float32)},
            "fc1": _linear_init(nk(), 1280, 1280, dtype),
            "fc2": _linear_init(nk(), 1280, d, dtype),
            "norm_out": {"w": jnp.ones((d,), jnp.float32),
                         "b": jnp.zeros((d,), jnp.float32)},
        }
    return params


def _self_attention(p, x, cfg: WanConfig, carve: WanCarve | None,
                    rope_cos, rope_sin, top_k=None, mesh=None):
    """Carved (or dense-fallback) self-attention over curve-ordered tokens.

    ``top_k`` may be a traced scalar (drop-rate warmup changes it per step;
    keeping it dynamic avoids a recompile per warmup step). With ``mesh``
    set, attention runs under Ulysses sequence parallelism (tokens sharded
    outside, heads sharded inside the shard_map island)."""
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = L.rms_norm(L.linear(p["q"], x), p["norm_q"], cfg.eps)
    k = L.rms_norm(L.linear(p["k"], x), p["norm_k"], cfg.eps)
    v = L.linear(p["v"], x)
    q = q.reshape(b, s, n, hd)
    k = k.reshape(b, s, n, hd)
    v = v.reshape(b, s, n, hd)

    if mesh is not None:
        if carve is not None and carve.sel_mask is not None:
            raise NotImplementedError(
                "WanCarve.sel_mask (selection replay) is single-device "
                "only — the Ulysses path has no planner-bypass plumbing")
        sparse = carve is not None and carve.sa_drop_rate > 0.25
        sp = mesh.shape.get("sp", 1)
        if n % sp != 0:
            # Ulysses needs heads % devices == 0; ring attention shards
            # tokens instead (reference ring plumbing,
            # `/root/reference/hyvideo/modules/xdit_ring_atten.py:226-429`).
            if sparse:
                raise ValueError(
                    f"carved attention requires num_heads ({n}) divisible "
                    f"by the sp mesh ({sp}) — the planner needs the full "
                    f"sequence per device (Ulysses); use more heads or a "
                    f"smaller mesh, or disable carving for ring attention")
            from ..parallel.ring import ring_attention
            q = L.apply_rope(q, rope_cos, rope_sin)
            k = L.apply_rope(k, rope_cos, rope_sin)
            out = ring_attention(q, k, v, mesh)
            return L.linear(p["o"], out.reshape(b, s, d))
        if sparse and top_k is None:
            nb = s // 128
            top_k = int(nb * (1.0 - carve.sa_drop_rate))
        out = ulysses_self_attention(
            q, k, v, rope_cos, rope_sin, mesh, sparse=sparse,
            block_neighbors=None if carve is None else jnp.asarray(
                carve.block_neighbors),
            top_k=top_k,
            p_remain=1.0 if carve is None else carve.p_remain,
            seqlen=None if carve is None else carve.seqlen,
            first_frame_blocks=0 if carve is None
            else carve.first_frame_blocks,
            q_rows=1 if carve is None
            else max(1, int(getattr(carve, "q_rows", 1))),
            joint_sel=False if carve is None
            else bool(getattr(carve, "joint_sel", False)))
        return L.linear(p["o"], out.reshape(b, s, d))

    q = L.apply_rope(q, rope_cos, rope_sin)
    k = L.apply_rope(k, rope_cos, rope_sin)

    if carve is None or carve.sa_drop_rate <= 0.25:
        if carve is not None and carve.sel_mask is not None:
            # a replay/ablation caller handing us a recorded selection
            # expects the sparse kernel to run it; silently timing dense
            # attention instead would corrupt the measurement
            raise ValueError(
                "WanCarve.sel_mask is set but sa_drop_rate "
                f"{carve.sa_drop_rate} <= 0.25 takes the dense fallback "
                "— the recorded selection would be silently ignored. "
                "Raise sa_drop_rate or clear sel_mask.")
        out = attention_bshd(q, k, v)
    else:
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        num_blocks = s // 128
        if top_k is None:
            # reference floor semantics: int(num_blocks * (1 - drop))
            # (`/root/reference/wan/modules/model_mul.py:164`)
            top_k = int(num_blocks * (1.0 - carve.sa_drop_rate))
        qr = max(1, int(getattr(carve, "q_rows", 1)))
        joint = qr > 1 and bool(getattr(carve, "joint_sel", False))
        if carve.sel_mask is not None:
            # the mask layout is q_rows/joint_sel-dependent (joint_sel
            # pools rows per group): a mask recorded under a different
            # q_group replays with a silently different effective pattern,
            # so it must be recorded with the SAME q_rows/joint_sel it is
            # replayed with. Shape-check here so a mismatched grid fails
            # loudly instead of deep in the kernel.
            mask = carve.sel_mask
            expect = (b, n, num_blocks, num_blocks)
            if tuple(mask.shape) != expect:
                raise ValueError(
                    f"WanCarve.sel_mask shape {tuple(mask.shape)} != "
                    f"{expect} expected for this stage (B, H, nqb, nkb) "
                    "— was it recorded on a different grid?")
        else:
            mask = build_block_mask(
                qt, kt,
                top_k=top_k, p_remain=carve.p_remain,
                text_start_block=num_blocks, text_blocks=0,
                block_neighbors=carve.block_neighbors,
                first_frame_blocks=carve.first_frame_blocks,
                sel_group=qr if joint else 1)
        # differentiable dispatch: Pallas kernels forward, recompute-style
        # jnp backward under jax.grad (LoRA fine-tuning on carved
        # trajectories, ops/sparse_autodiff.py)
        from ..ops.sparse_autodiff import sparse_attention_from_mask
        out = sparse_attention_from_mask(
            qt, kt, vt, mask, seqlens=carve.seqlen,
            text_start_block=num_blocks, q_rows=qr,
            joint=joint).transpose(0, 2, 1, 3)
    return L.linear(p["o"], out.reshape(b, s, d))


def _cross_attention(p, x, context, cfg: WanConfig, image_tokens: int = 0):
    """Dense cross-attention; i2v splits off leading CLIP image tokens
    through the decoupled k_img/v_img path
    (`/root/reference/wan/modules/model_mul.py:209-249`)."""
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = L.rms_norm(L.linear(p["q"], x), p["norm_q"], cfg.eps)
    q = q.reshape(b, s, n, hd)

    if image_tokens:
        ctx_img, ctx = context[:, :image_tokens], context[:, image_tokens:]
    else:
        ctx = context

    k = L.rms_norm(L.linear(p["k"], ctx), p["norm_k"], cfg.eps)
    v = L.linear(p["v"], ctx)
    k = k.reshape(b, -1, n, hd)
    v = v.reshape(b, -1, n, hd)
    out = attention_bshd(q, k, v)
    if image_tokens:
        k_img = L.rms_norm(L.linear(p["k_img"], ctx_img), p["norm_k_img"],
                           cfg.eps)
        v_img = L.linear(p["v_img"], ctx_img)
        k_img = k_img.reshape(b, -1, n, hd)
        v_img = v_img.reshape(b, -1, n, hd)
        out = out + attention_bshd(q, k_img, v_img)
    return L.linear(p["o"], out.reshape(b, s, d))


def _block(p, x, e6, context, cfg: WanConfig, carve, rope_cos, rope_sin,
           image_tokens: int, top_k=None, mesh=None):
    """One WanAttentionBlock (`/root/reference/wan/modules/model_mul.py:
    258-346`): 6-way modulation, sparse self-attn, dense cross-attn, MLP."""
    e = (p["modulation"][None].astype(jnp.float32) + e6)  # [B, 6, d] f32
    e0, e1, e2, e3, e4, e5 = [e[:, i:i + 1] for i in range(6)]

    y = L.modulate(L.layer_norm(x, eps=cfg.eps), shift=e0, scale=e1)
    y = _self_attention(p["self_attn"], y, cfg, carve, rope_cos, rope_sin,
                        top_k, mesh)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32)
         * e2.astype(jnp.float32)).astype(x.dtype)

    y = L.layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], cfg.eps) \
        if cfg.cross_attn_norm else x
    x = x + _cross_attention(p["cross_attn"], y, context, cfg, image_tokens)

    y = L.modulate(L.layer_norm(x, eps=cfg.eps), shift=e3, scale=e4)
    y = L.linear(p["ffn"]["fc2"], L.gelu_tanh(L.linear(p["ffn"]["fc1"], y)))
    x = (x.astype(jnp.float32) + y.astype(jnp.float32)
         * e5.astype(jnp.float32)).astype(x.dtype)
    return x


def wan_embed(params, cfg: WanConfig, x, t, context,
              carve: WanCarve | None = None, clip_fea=None, y=None):
    """Pre-trunk stage: patchify, curve reorder, time/text embeddings.

    Returns ``(h0, aux)`` where ``h0`` is the curve-ordered hidden sequence
    fed to the blocks and ``aux`` carries everything the trunk and head
    need (``e``/``e6`` are also the TeaCache skip metrics).
    """
    dtype = jnp.dtype(cfg.dtype)
    if y is not None:
        x = jnp.concatenate([x, y], axis=1)
    x = x.astype(dtype)

    h, grid = L.patchify_3d(params["patch_embedding"], x, cfg.patch_size)
    b, s, d = h.shape

    # time embedding (f32 island)
    temb = L.sinusoidal_embedding(cfg.freq_dim, t, flip_sin_cos=True)
    e = L.linear(params["time_embedding"]["fc2"],
                 L.silu(L.linear(params["time_embedding"]["fc1"], temb)))
    e = e.astype(jnp.float32)
    e6 = L.linear(params["time_projection"], L.silu(e)).reshape(b, 6, d)
    e6 = e6.astype(jnp.float32)

    # text embedding
    ctx = L.linear(params["text_embedding"]["fc2"],
                   L.gelu_tanh(L.linear(params["text_embedding"]["fc1"],
                                        context.astype(dtype))))
    image_tokens = 0
    if clip_fea is not None:
        ie = params["img_emb"]
        img = L.layer_norm(clip_fea.astype(jnp.float32), ie["norm_in"]["w"],
                           ie["norm_in"]["b"])
        img = L.linear(ie["fc2"], jax.nn.gelu(L.linear(ie["fc1"],
                                                       img.astype(dtype))))
        img = L.layer_norm(img, ie["norm_out"]["w"], ie["norm_out"]["b"])
        ctx = jnp.concatenate([img.astype(dtype), ctx], axis=1)
        image_tokens = clip_fea.shape[1]

    # curve reorder, then zero-pad the tail to a block multiple (pad tokens
    # join the last partial block and are masked via carve.seqlen)
    if carve is not None:
        h = h[:, jnp.asarray(carve.curve_order)]
        s_pad = -(-s // 128) * 128
        if s_pad > s:
            h = jnp.concatenate(
                [h, jnp.zeros((b, s_pad - s, d), h.dtype)], axis=1)

    aux = dict(e=e, e6=e6, ctx=ctx, grid=grid, seq=s,
               image_tokens=image_tokens)
    return h, aux


def wan_trunk(params, cfg: WanConfig, h, aux,
              carve: WanCarve | None = None, top_k=None, mesh=None,
              remat: bool = False):
    """The block stack; input/output are curve-ordered hidden states so the
    TeaCache residual ``h_out - h_in`` lives in this space
    (`/root/reference/jenga_wan.py:623-648`).

    ``remat`` wraps each block in ``jax.checkpoint`` — trades FLOPs for
    activation memory under ``jax.grad`` (LoRA fine-tuning at video
    lengths); a no-op for inference-only forwards. Carved forwards are
    differentiable: the block-sparse kernels' backward recomputes through
    the dense jnp oracle per head slice (``ops/sparse_autodiff.py``),
    which is where the memory goes — keep ``remat=True`` when training
    carved at long sequence lengths.
    """
    if carve is not None:
        rope_cos = jnp.asarray(carve.rope_cos)
        rope_sin = jnp.asarray(carve.rope_sin)
    else:
        rope_cos, rope_sin = map(jnp.asarray,
                                 wan_rope_tables(cfg, aux["grid"]))

    def run(p, h):
        return _block(p, h, aux["e6"], aux["ctx"], cfg, carve, rope_cos,
                      rope_sin, aux["image_tokens"], top_k, mesh)

    if remat:
        run = jax.checkpoint(run)
    for p in params["blocks"]:
        h = run(p, h)
    return h


def wan_head(params, cfg: WanConfig, h, aux,
             carve: WanCarve | None = None):
    """Inverse curve reorder + modulated zero-init head + unpatchify."""
    if carve is not None:
        # inverse_order[linear] = curve position; gather also drops the pad
        # tail because only real curve positions are referenced.
        h = h[:, jnp.asarray(carve.inverse_order)]
    hm = params["head"]["modulation"][None].astype(jnp.float32) \
        + aux["e"][:, None, :]
    out = L.modulate(L.layer_norm(h, eps=cfg.eps),
                     shift=hm[:, 0:1], scale=hm[:, 1:2])
    out = L.linear(params["head"]["linear"], out)
    return L.unpatchify_3d(out.astype(jnp.float32), aux["grid"],
                           cfg.patch_size, cfg.out_dim, channel_last=True)


def wan_first_selection_mask(params, cfg: WanConfig, x, t, context,
                             carve: WanCarve, top_k=None):
    """Diagnostic: the carving planner's one-hot selection mask for the
    FIRST block ([B, H, nb, nb]) — no attention is run. tools/bench_wan.py
    uses it to report the realized selection density of the measured
    regime (mirrors hyvideo.hy_first_selection_mask)."""
    h, aux = wan_embed(params, cfg, x, t, context, carve)
    p = params["blocks"][0]
    e = (p["modulation"][None].astype(jnp.float32) + aux["e6"])
    y = L.modulate(L.layer_norm(h, eps=cfg.eps),
                   shift=e[:, 0:1], scale=e[:, 1:2])
    b, s, d = y.shape
    n, hd = cfg.num_heads, cfg.head_dim
    sa = p["self_attn"]
    q = L.rms_norm(L.linear(sa["q"], y), sa["norm_q"], cfg.eps)
    k = L.rms_norm(L.linear(sa["k"], y), sa["norm_k"], cfg.eps)
    q = L.apply_rope(q.reshape(b, s, n, hd), jnp.asarray(carve.rope_cos),
                     jnp.asarray(carve.rope_sin))
    k = L.apply_rope(k.reshape(b, s, n, hd), jnp.asarray(carve.rope_cos),
                     jnp.asarray(carve.rope_sin))
    nb = s // 128
    if top_k is None:
        top_k = int(nb * (1.0 - carve.sa_drop_rate))
    qr = max(1, int(getattr(carve, "q_rows", 1)))
    joint = qr > 1 and bool(getattr(carve, "joint_sel", False))
    return build_block_mask(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        top_k=top_k, p_remain=carve.p_remain,
        text_start_block=nb, text_blocks=0,
        block_neighbors=carve.block_neighbors,
        first_frame_blocks=carve.first_frame_blocks,
        sel_group=qr if joint else 1)


def wan_forward(params, cfg: WanConfig, x, t, context,
                carve: WanCarve | None = None, clip_fea=None, y=None,
                top_k=None, mesh=None, remat: bool = False):
    """Full denoise velocity prediction.

    Args:
      x:        [B, C_in, F, H, W] noisy latents.
      t:        [B] diffusion timesteps.
      context:  [B, text_len, text_dim] padded text embeddings.
      carve:    carving spec for this stage (None = dense).
      clip_fea: [B, 257, 1280] CLIP features (i2v).
      y:        [B, C, F, H, W] conditioning latents (i2v), channel-concat.

    Returns [B, C_out, F, H, W] velocity in f32.
    """
    h, aux = wan_embed(params, cfg, x, t, context, carve, clip_fea, y)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        h = jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(None, "sp", None)))
    h = wan_trunk(params, cfg, h, aux, carve, top_k, mesh, remat=remat)
    return wan_head(params, cfg, h, aux, carve)
