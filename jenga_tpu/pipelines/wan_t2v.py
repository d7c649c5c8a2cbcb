"""Wan2.1 text-to-video sampler: carved DiT + UniPC + TeaCache + turbo.

TPU-first redesign of the reference ``t2v_generate``
(`/root/reference/jenga_wan.py:55-272`):

  * cond/uncond CFG branches ride one batch of 2 through a single jitted
    forward instead of two sequential model calls;
  * the TeaCache skip schedule is precomputed before the loop (the metric
    is a pure function of the timestep sequence — see
    ``jenga_tpu.diffusion.skip``), so every step is shape-static and there
    are exactly three compiled specializations per stage: dense-warmup,
    sparse, and skip;
  * the drop-rate warmup feeds the planner a *traced* ``top_k`` so warmup
    steps share one compilation;
  * stage state (curve plans, RoPE tables, schedules) is explicit data —
    no monkey-patched class attributes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.blocks import build_curve_plan
from ..diffusion import skip as skip_lib
from ..diffusion import dpm as dpm_lib
from ..diffusion.unipc import (
    unipc_add_noise,
    unipc_init,
    unipc_schedule,
    unipc_step,
    unipc_step_to_zero,
)


def _solver(name: str):
    """(schedule, init, step, step_to_zero, add_noise) for a solver name
    (reference ``--sample_solver``, `/root/reference/jenga_wan.py:137-156`:
    'unipc' | 'dpm++')."""
    if name in ("unipc",):
        return (unipc_schedule, unipc_init, unipc_step, unipc_step_to_zero,
                unipc_add_noise)
    if name in ("dpm++", "dpm"):
        return (dpm_lib.dpm_schedule, dpm_lib.dpm_init, dpm_lib.dpm_step,
                dpm_lib.dpm_step_to_zero, dpm_lib.dpm_add_noise)
    raise ValueError(f"unknown solver {name!r} (unipc | dpm++)")
from ..models import wan as wan_lib
from ..models.layers import sinusoidal_embedding, silu, linear

__all__ = ["WanT2VOptions", "WanT2VPipeline"]


@dataclasses.dataclass(frozen=True)
class WanT2VOptions:
    """Generation options (reference argparse flags,
    `/root/reference/jenga_wan.py:697-869`)."""
    size: tuple[int, int] = (832, 480)      # (W, H) pixels
    frame_num: int = 81
    shift: float = 8.0
    sampling_steps: int = 50
    guide_scale: float = 6.0
    sa_drop_rates: tuple[float, ...] = (0.75, 0.85)
    p_remain: float = 0.9
    enable_turbo: bool = False
    turbo_switch_step: int = 25
    teacache_thresh: float | None = 0.15
    use_ret_steps: bool = True
    solver: str = "unipc"       # unipc | dpm++
    curve: str = "sliced"
    seed: int = 0
    q_group: int = 1    # >1: shared-gather attention (see HYT2VOptions)
    joint_sel: bool = True   # see HYT2VOptions.joint_sel


class WanT2VPipeline:
    """Functional sampler around a Wan DiT parameter tree.

    ``vae_decode`` and the text encoders are injected (see
    ``jenga_tpu.codec`` / ``jenga_tpu.text``); ``generate`` accepts
    already-encoded prompt embeddings so the DiT loop is self-contained.
    """

    VAE_STRIDE = (4, 8, 8)

    def __init__(self, cfg: wan_lib.WanConfig, params,
                 model_id: str = "wan-t2v-1.3b", vae_decode=None,
                 mesh=None):
        self.cfg = cfg
        self.params = params
        self.model_id = model_id
        self.vae_decode = vae_decode
        self.mesh = mesh    # sequence-parallel mesh (Ulysses in every attn)

    # ---------------------------------------------------------- internals

    def _latent_shape(self, opts: WanT2VOptions):
        w, h = opts.size
        return (self.cfg.in_dim,
                (opts.frame_num - 1) // self.VAE_STRIDE[0] + 1,
                h // self.VAE_STRIDE[1], w // self.VAE_STRIDE[2])

    def _token_grid(self, latent_shape):
        _, f, h, w = latent_shape
        pt, ph, pw = self.cfg.patch_size
        return (f // pt, h // ph, w // pw)

    def _stage_fns(self, carve):
        """Three jitted specializations for one stage.

        ``params`` is an explicit argument (never a closure): closing over
        the tree would capture multi-GB of weights as compile-time
        constants and blow up lowering at 1.3B/14B scale.
        """
        cfg, mesh = self.cfg, self.mesh
        # carve is also an argument: its rope/curve tables (a registered
        # pytree) would otherwise become ~tens-of-MB HLO constants.

        @jax.jit
        def full(params, carve, x2, t2, ctx2, top_k):
            h0, aux = wan_lib.wan_embed(params, cfg, x2, t2, ctx2, carve)
            h1 = wan_lib.wan_trunk(params, cfg, h0, aux, carve, top_k,
                                   mesh=mesh)
            v = wan_lib.wan_head(params, cfg, h1, aux, carve)
            return v, h1 - h0

        @jax.jit
        def skipped(params, carve, x2, t2, ctx2, residual):
            h0, aux = wan_lib.wan_embed(params, cfg, x2, t2, ctx2, carve)
            return wan_lib.wan_head(params, cfg, h0 + residual, aux, carve)

        dense_carve = dataclasses.replace(carve, sa_drop_rate=0.0)

        def full_c(params, *a):
            return full(params, carve, *a)

        def full_dense_c(params, *a):
            return full(params, dense_carve, *a, jnp.zeros((), jnp.int32))

        def skipped_c(params, *a):
            return skipped(params, carve, *a)

        return full_c, full_dense_c, skipped_c

    def _teacache_schedule(self, timesteps: np.ndarray, opts: WanT2VOptions,
                           stage_starts):
        """Precompute the per-step compute/skip schedule (see skip.py)."""
        if opts.teacache_thresh is None:
            return np.ones(len(timesteps), bool)

        @jax.jit
        def embed_metric(p, ts):
            temb = sinusoidal_embedding(self.cfg.freq_dim, ts,
                                        flip_sin_cos=True)
            e = linear(p["time_embedding"]["fc2"],
                       silu(linear(p["time_embedding"]["fc1"], temb)))
            e = e.astype(jnp.float32)
            if opts.use_ret_steps:
                e = linear(p["time_projection"], silu(e))
            return e

        tp = {"time_embedding": self.params["time_embedding"],
              "time_projection": self.params["time_projection"]}
        embs = np.asarray(embed_metric(tp,
                                       jnp.asarray(timesteps, jnp.float32)))
        metrics = np.zeros(len(timesteps))
        for i in range(1, len(timesteps)):
            prev, cur = embs[i - 1], embs[i]
            metrics[i] = (np.abs(cur - prev).mean()
                          / max(np.abs(prev).mean(), 1e-12))
        coeffs = skip_lib.TEACACHE_COEFFS.get(
            (self.model_id, opts.use_ret_steps))
        if coeffs is None:
            coeffs = skip_lib.TEACACHE_COEFFS[("wan-t2v-1.3b",
                                               opts.use_ret_steps)]
        if opts.use_ret_steps:
            ret_steps, cutoff = 5, opts.sampling_steps
        else:
            ret_steps, cutoff = 1, opts.sampling_steps - 1
        return skip_lib.teacache_compute_schedule(
            metrics, opts.teacache_thresh, coeffs, ret_steps, cutoff,
            stage_starts=stage_starts)

    # ---------------------------------------------------------- generation

    def generate(self, context, context_null, opts: WanT2VOptions,
                 decode: bool = True, on_step=None, initial_latents=None,
                 stage2_noise=None):
        """Run the denoise loop. ``context``/``context_null`` are encoded
        prompt embeddings [L, text_dim] (unpadded). Returns decoded video
        (if a VAE is attached and ``decode``) else final latents
        [C, F, H, W] (f32). ``initial_latents`` [C, F, H, W] overrides the
        seeded noise; ``stage2_noise`` [C, F, H, W] overrides the turbo
        stage-switch re-noise draw (both for reproducibility /
        cross-implementation parity — the reference draws both from one
        generator, `/root/reference/jenga_wan.py:158-181`)."""
        from ..configs.validate import validate_wan_options
        validate_wan_options(opts)
        cfg = self.cfg
        latent_shape = self._latent_shape(opts)
        c, f, lh, lw = latent_shape

        # stage latent shapes (turbo runs stage 0 at 0.75 spatial res)
        res_rate0 = 0.75 if opts.enable_turbo else 1.0
        lh0 = int(lh * res_rate0) // 2 * 2
        lw0 = int(lw * res_rate0) // 2 * 2

        key = jax.random.PRNGKey(opts.seed)
        k0, k1 = jax.random.split(key)
        if initial_latents is not None:
            latents = jnp.asarray(initial_latents, jnp.float32)[None]
        else:
            latents = jax.random.normal(k0, (1, c, f, lh0, lw0),
                                        jnp.float32)
        if stage2_noise is not None:
            stage2_noise = jnp.asarray(stage2_noise, jnp.float32)[None]
        elif opts.enable_turbo:
            stage2_noise = jax.random.normal(k1, (1, c, f, lh, lw),
                                             jnp.float32)

        # padded text context batch [2, text_len, text_dim]
        def pad_ctx(x):
            x = jnp.asarray(x)[:cfg.text_len]
            pad = cfg.text_len - x.shape[0]
            return jnp.pad(x, ((0, pad), (0, 0)))
        ctx2 = jnp.stack([pad_ctx(context), pad_ctx(context_null)])

        # stage plans and jitted fns
        def stage_setup(shape):
            grid = self._token_grid((c,) + shape)
            plan = build_curve_plan(grid, opts.curve, 128)
            carve = wan_lib.make_wan_carve(
                cfg, plan, opts.sa_drop_rates[0], opts.p_remain,
                q_rows=opts.q_group,
                joint_sel=getattr(opts, "joint_sel", True))
            return carve, self._stage_fns(carve)

        carve0, fns0 = stage_setup((f, lh0, lw0))
        if opts.enable_turbo:
            carve1, fns1 = stage_setup((f, lh, lw))
        else:
            carve1, fns1 = carve0, fns0

        mk_sched, mk_init, do_step, to_zero, add_noise = _solver(opts.solver)
        schedule = mk_sched(opts.sampling_steps, shift=opts.shift)
        state = mk_init(schedule)
        n = schedule.num_steps
        switch = opts.turbo_switch_step

        # realized timestep sequence for the TeaCache precompute
        sched2 = mk_sched(opts.sampling_steps, shift=opts.shift + 2) \
            if opts.enable_turbo else None
        realized_t = np.array([
            (sched2.timestep(i) if (opts.enable_turbo and i > switch)
             else schedule.timestep(i)) for i in range(n)])
        stage_starts = {switch + 1} if opts.enable_turbo else set()
        compute = self._teacache_schedule(realized_t, opts, stage_starts)

        carve, fns = carve0, fns0
        residual = None
        stage_changed = False

        for idx in range(n):
            # drop-rate schedule + warmup (`/root/reference/jenga_wan.py:190-206`)
            rates = opts.sa_drop_rates
            base_rate = rates[0] if idx <= switch else rates[-1]
            warm = idx / max(n - 1, 1) * 10.0
            drop = min(base_rate, warm * base_rate)

            t_val = (sched2.timestep(idx)
                     if (opts.enable_turbo and stage_changed)
                     else schedule.timestep(idx))
            t2 = jnp.full((2,), t_val, jnp.float32)
            x2 = jnp.concatenate([latents, latents]).astype(jnp.float32)

            full, full_dense, skipped = fns
            if not compute[idx] and residual is not None:
                v2 = skipped(self.params, x2, t2, ctx2, residual)
            elif drop <= 0.25:
                v2, residual = full_dense(self.params, x2, t2, ctx2)
            else:
                nb = -(-carve.seqlen // 128)
                top_k = jnp.int32(max(int(nb * (1.0 - drop)), 1))
                v2, residual = full(self.params, x2, t2, ctx2, top_k)

            v = v2[1:2] + opts.guide_scale * (v2[0:1] - v2[1:2])

            if (opts.enable_turbo and idx >= switch and not stage_changed):
                # turbo stage switch (`/root/reference/jenga_wan.py:218-245`)
                stage_changed = True
                clean = to_zero(schedule, idx, v, latents)
                clean = jax.image.resize(clean, (1, c, f, lh, lw),
                                         method="trilinear")
                latents = add_noise(schedule, idx + 1, clean, stage2_noise)
                schedule = sched2
                if opts.solver == "unipc":
                    # UniPC-only corrector reset (reference quirk)
                    state = mk_init(schedule)
                    state = dataclasses.replace(
                        state, disable_corrector=tuple(range(24, 38)))
                else:
                    state = mk_init(schedule)
                state = dataclasses.replace(state, step_index=idx + 1)
                carve, fns = carve1, fns1
                residual = None
            else:
                state, latents = do_step(schedule, state, v, latents)

            if on_step is not None:
                # fidelity recording hook (see pipelines.loss_eval)
                on_step(idx, latents[0])

        latents = latents[0]
        if decode and self.vae_decode is not None:
            return self.vae_decode(latents)
        return latents
