"""HunyuanVideo MMDiT backbone, functional JAX with first-class carving.

Re-design of the reference ``HYVideoDiffusionTransformer``
(`/root/reference/hyvideo/modules/models_mul_block_gc_ha_multigpu.py:48-870`
plus the Jenga forward `/root/reference/jenga_hyvideo.py:61-234`): 20
double-stream blocks (separate img/txt streams with joint attention) + 40
single-stream blocks (fused qkv+mlp projections), hidden 3072 / 24 heads,
3-D RoPE dims (16, 56, 56) at theta 256, dual text conditioning (LLM token
states through a 2-layer token refiner + CLIP pooled vector into the
modulation), and optional guidance-distillation embedding.

Carving is first-class: image tokens are gilbert-reordered once at embed
time (fused into the RoPE tables), text tokens sit in the trailing blocks,
and every block's joint attention goes through the planner + the Pallas
block-sparse kernel with the text-amplitude bias. The fixed-list skip
policy caches the *image-stream* trunk residual
(`/root/reference/jenga_hyvideo.py:128-179`), exposed here through the
embed/trunk/head split.
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

__all__ = ["HYVideoConfig", "HYCarve", "init_hyvideo_params",
           "hyvideo_forward", "hyvideo_embed", "hyvideo_trunk",
           "hyvideo_head", "make_hy_carve", "hy_rope_tables",
           "HUNYUAN_VIDEO_T2V", "HUNYUAN_VIDEO_I2V"]


@dataclasses.dataclass(frozen=True)
class HYVideoConfig:
    """Architecture hyperparameters (reference ``HUNYUAN_VIDEO_CONFIG``,
    `/root/reference/hyvideo/modules/models_mul_block_gc_ha_multigpu.py:852-870`)."""
    patch_size: tuple[int, int, int] = (1, 2, 2)
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 3072
    heads_num: int = 24
    mlp_ratio: float = 4.0
    double_blocks: int = 20
    single_blocks: int = 40
    rope_dim_list: tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 256.0
    qkv_bias: bool = True
    guidance_embed: bool = True
    text_states_dim: int = 4096
    text_states_dim_2: int = 768
    refiner_depth: int = 2
    i2v_condition_type: str | None = None   # None | token_replace
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.heads_num

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)


HUNYUAN_VIDEO_T2V = HYVideoConfig()
HUNYUAN_VIDEO_I2V = HYVideoConfig(in_channels=33,
                                  i2v_condition_type="token_replace")


@dataclasses.dataclass(frozen=True)
class HYCarve:
    """Per-stage carving spec: curve + selection + text-bias parameters.

    Registered as a pytree (arrays = leaves, scalars = static metadata) so
    it can be passed as a jit ARGUMENT: closing over it would bake the
    ~60MB rope tables + curve orders into the HLO as constants, which blows
    up compile payloads (measured: minutes of remote-compile per stage)."""
    curve_order: np.ndarray        # [S_img] int32
    inverse_order: np.ndarray      # [S_img] int32
    block_neighbors: np.ndarray    # [nb, nb] bool over video blocks
    rope_cos: np.ndarray           # [S_img, head_dim//2] curve-permuted
    rope_sin: np.ndarray
    sa_drop_rate: float
    p_remain: float
    text_amp: float = 0.0
    txt_block_num: int = 2
    q_rows: int = 1     # >1: shared-gather kernel (q_rows query blocks
                        # share one union block list — wins when selection
                        # is local, i.e. with real checkpoints)
    joint_sel: bool = False  # q_rows>1 only: joint group selection — the
                        # planner pools queries at q_rows*128 granularity
                        # so the group's list IS every row's selection
                        # (union == density; gather bytes / q_rows). The
                        # TPU-tuned production mode; False keeps the
                        # reference's exact per-128-row selection.
    sel_mask: object = None  # optional precomputed selection mask
                        # ([B,H,nqb,nkb] bool incl. the all-true text
                        # rows) — bypasses the planner in every layer;
                        # selection replay (curve_viz triage) + planner
                        # ablations. See WanCarve.sel_mask.


jax.tree_util.register_dataclass(
    HYCarve,
    data_fields=["curve_order", "inverse_order", "block_neighbors",
                 "rope_cos", "rope_sin", "sel_mask"],
    meta_fields=["sa_drop_rate", "p_remain", "text_amp", "txt_block_num",
                 "q_rows", "joint_sel"])


def hy_rope_tables(cfg: HYVideoConfig, grid: tuple[int, int, int],
                   order: np.ndarray | None = None,
                   positions: tuple | None = None):
    """3-D RoPE tables at theta 256 (reference ``get_nd_rotary_pos_embed``,
    `/root/reference/hyvideo/modules/posemb_layers.py:232-299``); ``positions``
    lets the ProRes pipeline pass NTK-rescaled fractional coordinates."""
    cos, sin = L.rope_table_3d(grid, cfg.rope_dim_list, theta=cfg.rope_theta,
                               order=order, positions=positions)
    return cos, sin


def make_hy_carve(cfg: HYVideoConfig, plan, sa_drop_rate: float,
                  p_remain: float, text_amp: float = 0.0,
                  txt_block_num: int = 2,
                  positions: tuple | None = None,
                  q_rows: int = 1, joint_sel: bool = False) -> HYCarve:
    if q_rows > 8 and not joint_sel:
        raise ValueError(
            f"q_rows={q_rows} requires joint selection (per-row membership "
            "words hold at most 8 rows; ops/block_sparse_attention.py)")
    cos, sin = hy_rope_tables(cfg, plan.grid, order=plan.curve_order,
                              positions=positions)
    # device arrays: see make_wan_carve — avoids giant HLO literals.
    return HYCarve(curve_order=jnp.asarray(plan.curve_order),
                   inverse_order=jnp.asarray(plan.linear_to_curve),
                   block_neighbors=jnp.asarray(plan.block_neighbors),
                   rope_cos=jnp.asarray(cos), rope_sin=jnp.asarray(sin),
                   sa_drop_rate=float(sa_drop_rate),
                   p_remain=float(p_remain), text_amp=float(text_amp),
                   txt_block_num=int(txt_block_num), q_rows=int(q_rows),
                   joint_sel=bool(joint_sel))


# --------------------------------------------------------------- params


def _linear(key, d_in, d_out, dtype, bias=True, zero=False):
    p = {}
    if zero:
        p["w"] = jnp.zeros((d_in, d_out), dtype)
    else:
        bound = math.sqrt(6.0 / (d_in + d_out))
        p["w"] = jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_hyvideo_params(key, cfg: HYVideoConfig):
    """Random init (converters load real checkpoints)."""
    dtype = jnp.dtype(cfg.dtype)
    d, hd, mh = cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden
    n_keys = 40 + 20 * (cfg.double_blocks + cfg.single_blocks) \
        + 12 * cfg.refiner_depth
    keys = iter(jax.random.split(key, n_keys))
    nk = lambda: next(keys)
    bias = cfg.qkv_bias

    def mod(factor):
        return _linear(nk(), d, factor * d, jnp.float32)

    def double_block():
        return {
            "img_mod": mod(6), "txt_mod": mod(6),
            "img_qkv": _linear(nk(), d, 3 * d, dtype, bias=bias),
            "txt_qkv": _linear(nk(), d, 3 * d, dtype, bias=bias),
            "img_q_norm": jnp.ones((hd,), jnp.float32),
            "img_k_norm": jnp.ones((hd,), jnp.float32),
            "txt_q_norm": jnp.ones((hd,), jnp.float32),
            "txt_k_norm": jnp.ones((hd,), jnp.float32),
            "img_proj": _linear(nk(), d, d, dtype, bias=bias),
            "txt_proj": _linear(nk(), d, d, dtype, bias=bias),
            "img_mlp": {"fc1": _linear(nk(), d, mh, dtype),
                        "fc2": _linear(nk(), mh, d, dtype)},
            "txt_mlp": {"fc1": _linear(nk(), d, mh, dtype),
                        "fc2": _linear(nk(), mh, d, dtype)},
        }

    def single_block():
        return {
            "modulation": mod(3),
            "linear1": _linear(nk(), d, 3 * d + mh, dtype),
            "linear2": _linear(nk(), d + mh, d, dtype),
            "q_norm": jnp.ones((hd,), jnp.float32),
            "k_norm": jnp.ones((hd,), jnp.float32),
        }

    def refiner_block():
        return {
            "norm1": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            "qkv": _linear(nk(), d, 3 * d, dtype),
            "proj": _linear(nk(), d, d, dtype),
            "norm2": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            "mlp": {"fc1": _linear(nk(), d, mh, dtype),
                    "fc2": _linear(nk(), mh, d, dtype)},
            "adaLN": _linear(nk(), d, 2 * d, jnp.float32, zero=True),
        }

    patch_in = cfg.in_channels * math.prod(cfg.patch_size)
    params = {
        "img_in": _linear(nk(), patch_in, d, dtype),
        "txt_in": {
            "input_embedder": _linear(nk(), cfg.text_states_dim, d, dtype),
            "t_embedder": {"fc1": _linear(nk(), 256, d, jnp.float32),
                           "fc2": _linear(nk(), d, d, jnp.float32)},
            "c_embedder": {"fc1": _linear(nk(), cfg.text_states_dim, d,
                                          dtype),
                           "fc2": _linear(nk(), d, d, dtype)},
            "blocks": [refiner_block() for _ in range(cfg.refiner_depth)],
        },
        "time_in": {"fc1": _linear(nk(), 256, d, jnp.float32),
                    "fc2": _linear(nk(), d, d, jnp.float32)},
        "vector_in": {"fc1": _linear(nk(), cfg.text_states_dim_2, d,
                                     jnp.float32),
                      "fc2": _linear(nk(), d, d, jnp.float32)},
        "double_blocks": [double_block() for _ in range(cfg.double_blocks)],
        "single_blocks": [single_block() for _ in range(cfg.single_blocks)],
        "final_layer": {
            "linear": _linear(nk(), d,
                              math.prod(cfg.patch_size) * cfg.out_channels,
                              dtype, zero=True),
            "adaLN": _linear(nk(), d, 2 * d, jnp.float32, zero=True),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = {
            "fc1": _linear(nk(), 256, d, jnp.float32),
            "fc2": _linear(nk(), d, d, jnp.float32)}
    return params


# --------------------------------------------------------------- pieces


def _mod_tr(x, shift, scale, tr, which):
    """Modulate with optional token-replace override: first-frame tokens
    (static curve-ordered mask) take the t=0 modulation parameters
    (reference `/root/reference/hyvideo_i2v/modules/modulate_layers.py:
    38-71`). ``which`` picks the (shift, scale) pair from tr."""
    y = L.modulate(L.layer_norm(x), shift=shift, scale=scale)
    if tr is None:
        return y
    tr_shift, tr_scale = tr[which]
    y_tr = L.modulate(L.layer_norm(x), shift=tr_shift, scale=tr_scale)
    return jnp.where(tr["mask"][None, :, None], y_tr, y)


def _gate_tr(x, y, gate, tr, which):
    """Gated residual add with optional token-replace gate override."""
    g = gate.astype(jnp.float32)
    if tr is not None:
        g = jnp.where(tr["mask"][None, :, None],
                      tr[which].astype(jnp.float32), g)
    return (x.astype(jnp.float32) + y.astype(jnp.float32) * g).astype(
        x.dtype)


def _timestep_embedder(p, t):
    """sinusoidal(256, cos-first) -> Linear -> SiLU -> Linear, f32
    (reference TimestepEmbedder,
    `/root/reference/hyvideo/modules/embed_layers.py:85-157`)."""
    emb = L.sinusoidal_embedding(256, t, flip_sin_cos=True)
    return L.linear(p["fc2"], L.silu(L.linear(p["fc1"], emb))
                    ).astype(jnp.float32)


def _mlp_embedder(p, x):
    return L.linear(p["fc2"], L.silu(L.linear(p["fc1"], x)))


def _token_refiner(p, cfg: HYVideoConfig, txt, t, mask):
    """2-layer cross-modal refiner for LLM text states (reference
    ``SingleTokenRefiner``,
    `/root/reference/hyvideo/modules/token_refiner.py:16-236`)."""
    dtype = jnp.dtype(cfg.dtype)
    t_emb = _timestep_embedder(p["t_embedder"], t)
    if mask is None:
        pooled = txt.mean(axis=1)
    else:
        mf = mask.astype(jnp.float32)[..., None]
        pooled = (txt * mf).sum(axis=1) / jnp.maximum(mf.sum(axis=1), 1.0)
    c = t_emb + _mlp_embedder(p["c_embedder"], pooled.astype(dtype)
                              ).astype(jnp.float32)
    x = L.linear(p["input_embedder"], txt.astype(dtype))

    b, s, d = x.shape
    n, hd = cfg.heads_num, cfg.head_dim
    attn_mask = None
    if mask is not None:
        m = mask.astype(bool)
        attn_mask = m[:, None, :] & m[:, :, None]
        attn_mask = attn_mask.at[:, :, 0].set(True)

    for blk in p["blocks"]:
        gate = L.linear(blk["adaLN"], L.silu(c)).astype(jnp.float32)
        gate_msa, gate_mlp = gate[:, None, :d], gate[:, None, d:]
        nx = L.layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"])
        qkv = L.linear(blk["qkv"], nx).reshape(b, s, 3, n, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * hd ** -0.5
        if attn_mask is not None:
            logits = jnp.where(attn_mask[:, None], logits, -jnp.inf)
        pa = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", pa, v.astype(jnp.float32))
        attn = attn.reshape(b, s, d).astype(x.dtype)
        x = (x.astype(jnp.float32) + L.linear(blk["proj"], attn)
             .astype(jnp.float32) * gate_msa).astype(x.dtype)
        y = L.layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"])
        y = L.linear(blk["mlp"]["fc2"], L.silu(L.linear(blk["mlp"]["fc1"],
                                                        y)))
        x = (x.astype(jnp.float32) + y.astype(jnp.float32) * gate_mlp
             ).astype(x.dtype)
    return x


def _joint_attention(q, k, v, cfg: HYVideoConfig, carve: HYCarve | None,
                     img_len: int, seqlen: int, top_k=None, mesh=None):
    """Joint img+txt attention: sparse video rows + dense text rows in one
    kernel launch (the reference splits into a Triton kernel + a
    flash-attn call, `/root/reference/hyvideo/modules/
    attention_block_triton_diffres.py:298-396`)."""
    b, s, n, hd = q.shape
    s_pad = -(-s // 128) * 128
    # dense fallback: no carving, or the sequence is so short that there is
    # no video block left after the trailing text blocks (tiny test shapes)
    kv_len = None if seqlen is None else jnp.broadcast_to(
        jnp.asarray(seqlen, jnp.int32).reshape(-1), (b,))
    carved = not (carve is None or carve.sa_drop_rate == 0.0
                  or s_pad // 128 <= carve.txt_block_num)
    ring_n = 1 if mesh is None else mesh.shape.get("ring", 1)
    if carved and mesh is not None and (
            n % mesh.shape.get("sp", 1) != 0 or ring_n > 1):
        # Carving runs under Ulysses only: each device must hold the FULL
        # sequence for whole heads (block selection is full-sequence,
        # per-head). A ring axis splits the sequence and a non-dividing
        # head count breaks the all-to-all; both degrade to DENSE ring
        # attention. Silently discarding the carving speedup burned
        # round-1 reviewers: warn loudly (once per trace).
        from ..utils.logging import get_logger
        get_logger().warning(
            "carving DISABLED: heads_num=%d / mesh sp=%d ring=%d — joint "
            "attention degrades to dense ring attention and the carving "
            "speedup is lost. Use ring_degree=1 with an sp degree that "
            "divides the head count.", n, mesh.shape.get("sp", 1), ring_n)
        carved = False
    if carve is not None and carve.sel_mask is not None and not carved:
        # replay callers must fail loudly on EVERY non-carved path (dense
        # fallback, ring degradation, tiny-shape short-circuit) — not just
        # the Ulysses one below — or a recorded selection is silently
        # dropped and the caller times/validates dense attention instead
        raise NotImplementedError(
            "HYCarve.sel_mask (selection replay) is set but this call "
            "does not take the carved single-device path (dense fallback "
            "or ring/mesh degradation) — the recorded selection would be "
            "silently ignored")
    if not carved:
        if mesh is not None and ring_n > 1:
            # explicit ring x ulysses composition (dense, like the
            # reference ring path): img tokens sharded over both axes,
            # replicated text KV folded per ring step
            from ..parallel.ring import ring_ulysses_attention
            out = ring_ulysses_attention(
                q[:, :img_len], k[:, :img_len], v[:, :img_len], mesh,
                joint_k=k[:, img_len:], joint_v=v[:, img_len:],
                joint_kv_len=None if kv_len is None else kv_len - img_len)
            txt_out = attention_bshd(q[:, img_len:], k, v, kv_len=kv_len)
            return jnp.concatenate([out, txt_out],
                                   axis=1).reshape(b, s, n * hd)
        if mesh is not None and n % mesh.shape.get("sp", 1) != 0:
            # heads don't divide the mesh: ring attention over img tokens
            # with replicated text KV appended per step (the reference's
            # joint-ring semantics,
            # `/root/reference/hyvideo/modules/xdit_ring_atten.py:333-360`)
            from ..parallel.ring import ring_attention
            out = ring_attention(
                q[:, :img_len], k[:, :img_len], v[:, :img_len], mesh,
                joint_k=k[:, img_len:], joint_v=v[:, img_len:],
                joint_kv_len=None if kv_len is None else kv_len - img_len)
            txt_out = attention_bshd(q[:, img_len:], k, v, kv_len=kv_len)
            return jnp.concatenate([out, txt_out],
                                   axis=1).reshape(b, s, n * hd)
        return attention_bshd(q, k, v, kv_len=kv_len).reshape(b, s, n * hd)

    pad = s_pad - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    num_blocks = s_pad // 128
    tsb = num_blocks - carve.txt_block_num
    if top_k is None:
        top_k = int((1.0 - carve.sa_drop_rate) * (img_len // 128))

    if mesh is not None:
        if carve.sel_mask is not None:
            raise NotImplementedError(
                "HYCarve.sel_mask (selection replay) is single-device "
                "only — the Ulysses path has no planner-bypass plumbing")
        # RoPE is already applied (HY rotates img q/k pre-concat), so no
        # tables are passed into the Ulysses island.
        out = ulysses_self_attention(
            q, k, v, None, None, mesh, sparse=True,
            block_neighbors=jnp.asarray(carve.block_neighbors),
            top_k=top_k, p_remain=carve.p_remain, seqlen=seqlen,
            text_start_block=tsb, text_blocks=carve.txt_block_num,
            text_amp=carve.text_amp,
            q_rows=max(1, int(getattr(carve, "q_rows", 1))),
            joint_sel=bool(getattr(carve, "joint_sel", False)))
        return out[:, :s].reshape(b, s, n * hd)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    qr = max(1, int(carve.q_rows))
    joint = qr > 1 and bool(getattr(carve, "joint_sel", False))
    if carve.sel_mask is not None:
        # layout is q_rows/joint_sel-dependent (joint_sel pools rows per
        # group): replay with the SAME q_rows/joint_sel the mask was
        # recorded under. Shape-check so grid mismatches fail loudly.
        mask = carve.sel_mask
        expect = (b, n, num_blocks, num_blocks)
        if tuple(mask.shape) != expect:
            raise ValueError(
                f"HYCarve.sel_mask shape {tuple(mask.shape)} != {expect} "
                "expected (B, H, nqb, nkb incl. text rows) — was it "
                "recorded on a different grid?")
    else:
        mask = build_block_mask(
            qt[:, :, :tsb * 128], kt, top_k=top_k, p_remain=carve.p_remain,
            text_start_block=tsb, text_blocks=carve.txt_block_num,
            block_neighbors=jnp.asarray(carve.block_neighbors),
            sel_group=qr if joint else 1)
        full = jnp.ones((b, n, num_blocks - tsb, num_blocks), bool)
        mask = jnp.concatenate([mask, full], axis=2)
    # differentiable dispatch: Pallas kernels forward, recompute-style jnp
    # backward under jax.grad (ops/sparse_autodiff.py)
    from ..ops.sparse_autodiff import sparse_attention_from_mask
    out = sparse_attention_from_mask(
        qt, kt, vt, mask, seqlens=seqlen, text_start_block=tsb,
        text_amp=carve.text_amp, q_rows=qr, joint=joint)
    return out.transpose(0, 2, 1, 3)[:, :s].reshape(b, s, n * hd)


def _double_qkv(p, img, txt, vec, cfg, rope_cos, rope_sin, tr=None):
    """Modulation chunks + joint q/k/v of a double block (shared by the
    block forward and the selection diagnostics)."""
    b, si, d = img.shape
    st = txt.shape[1]
    n, hd = cfg.heads_num, cfg.head_dim

    imod = L.linear(p["img_mod"], L.silu(vec)).astype(jnp.float32)[:, None]
    tmod = L.linear(p["txt_mod"], L.silu(vec)).astype(jnp.float32)[:, None]
    im = [imod[..., i * d:(i + 1) * d] for i in range(6)]
    tr_img = None
    if tr is not None:
        trmod = L.linear(p["img_mod"],
                         L.silu(tr["vec"])).astype(jnp.float32)[:, None]
        trm = [trmod[..., i * d:(i + 1) * d] for i in range(6)]
        tr_img = {"mask": tr["mask_img"],
                  "mod1": (trm[0], trm[1]), "gate1": trm[2],
                  "mod2": (trm[3], trm[4]), "gate2": trm[5]}
    tm = [tmod[..., i * d:(i + 1) * d] for i in range(6)]

    img_mod = _mod_tr(img, im[0], im[1], tr_img, "mod1")
    img_qkv = L.linear(p["img_qkv"], img_mod).reshape(b, si, 3, n, hd)
    img_q = L.rms_norm(img_qkv[:, :, 0], p["img_q_norm"])
    img_k = L.rms_norm(img_qkv[:, :, 1], p["img_k_norm"])
    img_v = img_qkv[:, :, 2]
    img_q = L.apply_rope(img_q, rope_cos, rope_sin)
    img_k = L.apply_rope(img_k, rope_cos, rope_sin)

    txt_mod = L.modulate(L.layer_norm(txt), shift=tm[0], scale=tm[1])
    txt_qkv = L.linear(p["txt_qkv"], txt_mod).reshape(b, st, 3, n, hd)
    txt_q = L.rms_norm(txt_qkv[:, :, 0], p["txt_q_norm"])
    txt_k = L.rms_norm(txt_qkv[:, :, 1], p["txt_k_norm"])
    txt_v = txt_qkv[:, :, 2]

    q = jnp.concatenate([img_q, txt_q], axis=1)
    k = jnp.concatenate([img_k, txt_k], axis=1)
    v = jnp.concatenate([img_v, txt_v], axis=1)
    return q, k, v, im, tm, tr_img


def _double_block(p, img, txt, vec, cfg, carve, rope_cos, rope_sin,
                  seqlen, top_k, mesh, tr=None):
    """MMDoubleStreamBlock (`/root/reference/hyvideo/modules/
    models_mul_block_gc_ha_multigpu.py:48-316`; token-replace variant
    `/root/reference/hyvideo_i2v/modules/models_mul.py:147-295`)."""
    b, si, d = img.shape
    q, k, v, im, tm, tr_img = _double_qkv(p, img, txt, vec, cfg, rope_cos,
                                          rope_sin, tr)

    attn = _joint_attention(q, k, v, cfg, carve, si, seqlen, top_k, mesh)
    img_attn, txt_attn = attn[:, :si], attn[:, si:]

    def gated(x, y, gate):
        return (x.astype(jnp.float32)
                + y.astype(jnp.float32) * gate).astype(x.dtype)

    img = _gate_tr(img, L.linear(p["img_proj"], img_attn), im[2], tr_img,
                   "gate1")
    y = _mod_tr(img, im[3], im[4], tr_img, "mod2")
    y = L.linear(p["img_mlp"]["fc2"], L.gelu_tanh(
        L.linear(p["img_mlp"]["fc1"], y)))
    img = _gate_tr(img, y, im[5], tr_img, "gate2")

    txt = gated(txt, L.linear(p["txt_proj"], txt_attn), tm[2])
    y = L.modulate(L.layer_norm(txt), shift=tm[3], scale=tm[4])
    y = L.linear(p["txt_mlp"]["fc2"], L.gelu_tanh(
        L.linear(p["txt_mlp"]["fc1"], y)))
    txt = gated(txt, y, tm[5])
    return img, txt


def _single_block(p, x, vec, cfg, carve, rope_cos, rope_sin, txt_len,
                  seqlen, top_k, mesh, tr=None):
    """MMSingleStreamBlock (`/root/reference/hyvideo/modules/
    models_mul_block_gc_ha_multigpu.py:319-500`)."""
    b, s, d = x.shape
    n, hd, mh = cfg.heads_num, cfg.head_dim, cfg.mlp_hidden

    m = L.linear(p["modulation"], L.silu(vec)).astype(jnp.float32)[:, None]
    shift, scale, gate = m[..., :d], m[..., d:2 * d], m[..., 2 * d:]
    tr_full = None
    if tr is not None:
        tm = L.linear(p["modulation"],
                      L.silu(tr["vec"])).astype(jnp.float32)[:, None]
        tr_full = {"mask": tr["mask_full"],
                   "mod": (tm[..., :d], tm[..., d:2 * d]),
                   "gate": tm[..., 2 * d:]}
    x_mod = _mod_tr(x, shift, scale, tr_full, "mod")
    y = L.linear(p["linear1"], x_mod)
    qkv, mlp = y[..., :3 * d], y[..., 3 * d:]
    qkv = qkv.reshape(b, s, 3, n, hd)
    q = L.rms_norm(qkv[:, :, 0], p["q_norm"])
    k = L.rms_norm(qkv[:, :, 1], p["k_norm"])
    v = qkv[:, :, 2]

    img_len = s - txt_len
    q = jnp.concatenate([L.apply_rope(q[:, :img_len], rope_cos, rope_sin),
                         q[:, img_len:]], axis=1)
    k = jnp.concatenate([L.apply_rope(k[:, :img_len], rope_cos, rope_sin),
                         k[:, img_len:]], axis=1)

    attn = _joint_attention(q, k, v, cfg, carve, img_len, seqlen, top_k,
                            mesh)
    out = L.linear(p["linear2"],
                   jnp.concatenate([attn, L.gelu_tanh(mlp)], axis=-1))
    return _gate_tr(x, out, gate, tr_full, "gate")


# --------------------------------------------------------------- stages


def hyvideo_embed(params, cfg: HYVideoConfig, x, t, text_states, text_mask,
                  text_states_2, carve: HYCarve | None = None,
                  guidance=None):
    """Patchify + curve reorder + refiner + modulation vector."""
    dtype = jnp.dtype(cfg.dtype)
    b = x.shape[0]
    img, grid = L.patchify_3d(params["img_in"], x.astype(dtype),
                              cfg.patch_size)

    vec = _timestep_embedder(params["time_in"], t)
    vec = vec + _mlp_embedder(params["vector_in"],
                              text_states_2.astype(jnp.float32))
    if cfg.guidance_embed:
        if guidance is None:
            guidance = jnp.full((b,), 1000.0, jnp.float32)
        vec = vec + _timestep_embedder(params["guidance_in"], guidance)
    vec = vec.astype(jnp.float32)

    txt = _token_refiner(params["txt_in"], cfg, text_states, t, text_mask)

    # token-replace (I2V): first-frame tokens carry the t=0 modulation
    # (reference `/root/reference/jenga_hyi2v.py:78-130`). The first-frame
    # mask follows the curve reorder and is a static constant per stage.
    tr = None
    if cfg.i2v_condition_type == "token_replace":
        t0 = jnp.zeros_like(t)
        tr_vec = _timestep_embedder(params["time_in"], t0)
        tr_vec = tr_vec + _mlp_embedder(
            params["vector_in"], text_states_2.astype(jnp.float32))
        tr_vec = tr_vec.astype(jnp.float32)
        ff = grid[1] * grid[2]
        mask_img = jnp.arange(img.shape[1]) < ff
        if carve is not None:
            # traced-safe gather (carve may be a jit argument)
            mask_img = mask_img[jnp.asarray(carve.curve_order)]
        mask_full = jnp.concatenate(
            [mask_img, jnp.zeros(txt.shape[1], bool)])
        tr = dict(vec=tr_vec, mask_img=mask_img, mask_full=mask_full)

    if carve is not None:
        img = img[:, jnp.asarray(carve.curve_order)]
        rope_cos = jnp.asarray(carve.rope_cos)
        rope_sin = jnp.asarray(carve.rope_sin)
    else:
        rope_cos, rope_sin = map(
            jnp.asarray, hy_rope_tables(cfg, grid))

    # per-sample valid joint-sequence lengths: img tokens + REAL text
    # tokens; padded text keys are masked out of attention like the
    # reference's cu_seqlens do (`/root/reference/hyvideo/modules/
    # attenion.py:34-57`, carved path `attention_block_triton_diffres.py:
    # 327-329`).
    if text_mask is not None:
        seqlens = img.shape[1] + jnp.sum(
            text_mask.astype(jnp.int32), axis=-1)
    else:
        seqlens = jnp.full((b,), img.shape[1] + txt.shape[1], jnp.int32)

    aux = dict(vec=vec, grid=grid, rope_cos=rope_cos, rope_sin=rope_sin,
               txt_len=txt.shape[1], tr=tr, seqlens=seqlens)
    return img, txt, aux


def hyvideo_trunk(params, cfg: HYVideoConfig, img, txt, aux,
                  carve: HYCarve | None = None, top_k=None, mesh=None,
                  remat: bool = False, scan: bool = False):
    """Double + single block stack; input/output img is curve-ordered (the
    fixed-list skip residual lives on this img stream). ``remat`` wraps
    blocks in ``jax.checkpoint`` (activation memory for fine-tuning).
    ``scan`` runs each homogeneous block stack as ONE ``lax.scan`` over
    stacked parameters: XLA then reuses a single layer's buffers instead
    of scheduling the unrolled stack's live ranges — this is what lets a
    6-layer 115k-token program fit a 16GB v5e (inference peak is layer
    working set, not activation count; see bench.py BENCH_FULL)."""
    vec = aux["vec"]
    rope_cos, rope_sin = aux["rope_cos"], aux["rope_sin"]
    seqlen = aux.get("seqlens")
    if seqlen is None:
        seqlen = jnp.full((img.shape[0],), img.shape[1] + txt.shape[1],
                          jnp.int32)
    tr = aux.get("tr")
    tr_img = None if tr is None else dict(vec=tr["vec"],
                                          mask_img=tr["mask_img"])
    tr_full = None if tr is None else dict(vec=tr["vec"],
                                           mask_full=tr["mask_full"])

    def run_double(p, img, txt):
        return _double_block(p, img, txt, vec, cfg, carve, rope_cos,
                             rope_sin, seqlen, top_k, mesh, tr_img)

    def run_single(p, x):
        return _single_block(p, x, vec, cfg, carve, rope_cos, rope_sin,
                             aux["txt_len"], seqlen, top_k, mesh, tr_full)

    if remat:
        run_double = jax.checkpoint(run_double)
        run_single = jax.checkpoint(run_single)
    if scan:
        if params["double_blocks"]:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *params["double_blocks"])
            (img, txt), _ = jax.lax.scan(
                lambda c, p: (run_double(p, *c), None), (img, txt), stacked)
        x = jnp.concatenate([img, txt], axis=1)
        if params["single_blocks"]:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *params["single_blocks"])
            x, _ = jax.lax.scan(
                lambda c, p: (run_single(p, c), None), x, stacked)
        return x[:, :img.shape[1]]
    for p in params["double_blocks"]:
        img, txt = run_double(p, img, txt)
    x = jnp.concatenate([img, txt], axis=1)
    for p in params["single_blocks"]:
        x = run_single(p, x)
    return x[:, :img.shape[1]]


def hyvideo_head(params, cfg: HYVideoConfig, img, aux,
                 carve: HYCarve | None = None):
    """Inverse curve + modulated zero-init final layer + unpatchify."""
    if carve is not None:
        img = img[:, jnp.asarray(carve.inverse_order)]
    fl = params["final_layer"]
    m = L.linear(fl["adaLN"], L.silu(aux["vec"])).astype(jnp.float32)
    d = cfg.hidden_size
    shift, scale = m[:, None, :d], m[:, None, d:]
    out = L.modulate(L.layer_norm(img), shift=shift, scale=scale)
    out = L.linear(fl["linear"], out)
    return L.unpatchify_3d(out.astype(jnp.float32), aux["grid"],
                           cfg.patch_size, cfg.out_channels)


def hy_first_selection_mask(params, cfg: HYVideoConfig, x, t, text_states,
                            text_mask, text_states_2,
                            carve: HYCarve, guidance=None, top_k=None):
    """Diagnostic: the carving planner's one-hot selection mask for the
    FIRST double block (video query rows, [B, H, tsb, num_blocks]) — no
    attention is run. bench.py uses it to report the realized selection
    density and the shared-gather union fraction of the measured regime."""
    img, txt, aux = hyvideo_embed(params, cfg, x, t, text_states, text_mask,
                                  text_states_2, carve, guidance)
    tr = aux.get("tr")
    tr_img = None if tr is None else dict(vec=tr["vec"],
                                          mask_img=tr["mask_img"])
    q, k, _v, *_ = _double_qkv(params["double_blocks"][0], img, txt,
                               aux["vec"], cfg, aux["rope_cos"],
                               aux["rope_sin"], tr_img)
    b, s, n, hd = q.shape
    si = img.shape[1]
    s_pad = -(-s // 128) * 128
    pad = s_pad - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    tsb = s_pad // 128 - carve.txt_block_num
    if top_k is None:
        top_k = int((1.0 - carve.sa_drop_rate) * (si // 128))
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    qr = max(1, int(getattr(carve, "q_rows", 1)))
    joint = qr > 1 and bool(getattr(carve, "joint_sel", False))
    return build_block_mask(
        qt[:, :, :tsb * 128], kt, top_k=top_k, p_remain=carve.p_remain,
        text_start_block=tsb, text_blocks=carve.txt_block_num,
        block_neighbors=jnp.asarray(carve.block_neighbors),
        sel_group=qr if joint else 1)


def hyvideo_forward(params, cfg: HYVideoConfig, x, t, text_states,
                    text_mask=None, text_states_2=None,
                    carve: HYCarve | None = None, guidance=None,
                    top_k=None, mesh=None):
    """Full velocity prediction. x: [B, C, F, H, W]; text_states
    [B, L, 4096] LLM token states; text_states_2 [B, 768] CLIP pooled."""
    if text_states_2 is None:
        text_states_2 = jnp.zeros((x.shape[0], cfg.text_states_dim_2),
                                  jnp.float32)
    img, txt, aux = hyvideo_embed(params, cfg, x, t, text_states, text_mask,
                                  text_states_2, carve, guidance)
    if mesh is not None:
        # token-shard the img stream over the sp axis (text stays
        # replicated; the Ulysses island reshards heads internally)
        from jax.sharding import NamedSharding, PartitionSpec as P
        img = jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh, P(None, "sp", None)))
    img = hyvideo_trunk(params, cfg, img, txt, aux, carve, top_k, mesh)
    return hyvideo_head(params, cfg, img, aux, carve)
