"""Multi-chip dryrun worker: runs in a subprocess on a virtual CPU mesh.

``__graft_entry__.dryrun_multichip`` re-execs this module so the backend is
guaranteed to be N host-CPU devices: this environment's sitecustomize
force-registers a remote TPU PJRT plugin and overrides ``JAX_PLATFORMS``,
so the config must be reset in-process *before* any backend initializes
(same trick as tests/conftest.py).

Each case runs the SAME forward twice — jitted over the n-device mesh
(Ulysses/ring + FSDP-sharded params) and on one device with identical
nonzero random inputs — and asserts the outputs match: the dryrun proves
resharding *equivalence*, not just that a finite program compiles.

Covers the seven multi-chip paths (VERDICT r4 item 4 added the last
four):
  * Wan2.1: full carved CFG denoise step (forward + guidance + first-order
    flow update) with Ulysses sequence parallelism and FSDP-sharded params;
  * Wan2.1 Turbo stage switch: carved CFG step at the reduced-res stage-0
    geometry, first-order to-zero + trilinear resize + re-noise, then a
    carved step at the full-res stage-1 geometry — the resharding across
    the shape change (reference `/root/reference/jenga_wan.py:218-245`);
  * HunyuanVideo: carved MMDiT forward with trailing text blocks, nonzero
    text-amplitude bias and the PRODUCTION shared-gather configuration
    (q_rows=8, joint group selection, all-member kernel) — the joint-text
    Ulysses path (reference semantics
    `/root/reference/hyvideo/modules/xdit_ring_atten.py:133-177`);
  * HunyuanVideo q_rows=16 all-member: the widest supported shared-gather
    group (2048-token selection granularity, no membership words);
  * HunyuanVideo I2V token_replace: first-frame tokens modulated at t=0
    through the carved Ulysses path (the tr-mask/modulation plumbing,
    reference `/root/reference/jenga_hyi2v.py:123-204`);
  * HunyuanVideo ring fallback: head count NOT divisible by the mesh, so
    joint attention runs as ring attention with replicated text KV;
  * HunyuanVideo ring x ulysses: explicit 2-D mesh (ring outer axis x sp
    inner axis), dense joint attention composed over both axes
    (`/root/reference/hyvideo/modules/xdit_ring_atten.py:226-429`).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")


def _argv_n(default: int = 8) -> int:
    # import-safe: under pytest sys.argv[1] is the test file path, not a
    # device count (tests/test_dryrun_cases.py imports this module to run
    # individual cases in-process)
    if len(sys.argv) > 1:
        try:
            return int(sys.argv[1])
        except ValueError:
            return default
    return default


_N = _argv_n()
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += f" --xla_force_host_platform_device_count={_N}"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _check(mesh_out, single_out, label: str, atol=2e-4) -> None:
    a = np.asarray(mesh_out)
    b = np.asarray(single_out)
    assert np.isfinite(a).all(), f"{label}: non-finite mesh output"
    np.testing.assert_allclose(
        a, b, atol=atol, rtol=2e-4,
        err_msg=f"{label}: mesh output != single-device output")


def wan_step(n_devices: int) -> None:
    """Carved CFG denoise step over an n-device mesh: Ulysses in every
    self-attention, FSDP-style parameter sharding."""
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.diffusion.unipc import unipc_schedule
    from jenga_tpu.models.wan import (
        WanConfig, init_wan_params, make_wan_carve, wan_forward)
    from jenga_tpu.parallel.mesh import (
        make_sp_mesh, replicate, shard_params_fsdp)

    mesh = make_sp_mesh(jax.devices()[:n_devices])

    # tiny model: head count divides the mesh, head_dim 128 (production)
    cfg = WanConfig(dim=128 * n_devices, ffn_dim=256 * n_devices,
                    freq_dim=32, num_heads=n_devices, num_layers=2,
                    text_dim=64, text_len=16, dtype="float32")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    sharded = shard_params_fsdp(params, mesh)

    grid = (2, 8, 16)  # 256 tokens = 2 blocks, divisible by the mesh
    key = jax.random.PRNGKey(42)
    latent = jax.random.normal(key, (1, cfg.in_dim, 2, 16, 32), jnp.float32)
    ctx2 = jax.random.normal(jax.random.fold_in(key, 1),
                             (2, cfg.text_len, cfg.text_dim), jnp.float32)
    plan = build_curve_plan(grid, "sliced", 128)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.5, p_remain=0.9)
    schedule = unipc_schedule(10, shift=5.0)
    sigma0, sigma1 = float(schedule.sigmas[0]), float(schedule.sigmas[1])
    t = jnp.full((2,), schedule.timestep(0), jnp.float32)

    def denoise_step(params, latent, ctx2, mesh):
        x2 = jnp.concatenate([latent, latent])
        v2 = wan_forward(params, cfg, x2, t, ctx2, carve=carve, mesh=mesh)
        v = v2[1:2] + 5.0 * (v2[0:1] - v2[1:2])
        # first-order (Euler-equivalent) flow update
        x0 = latent - sigma0 * v
        return (1.0 - sigma1) * x0 + sigma1 * (latent - (1 - sigma0) * v) \
            / max(sigma0, 1e-6)

    out = jax.jit(lambda p, x, c: denoise_step(p, x, c, mesh))(
        sharded, replicate(latent, mesh), replicate(ctx2, mesh))
    ref = jax.jit(lambda p, x, c: denoise_step(p, x, c, None))(
        params, latent, ctx2)
    _check(out, ref, "wan CFG step")


def wan_turbo_switch(n_devices: int) -> None:
    """Turbo stage switch under the mesh: carved CFG forward at the
    reduced-res stage-0 geometry, first-order to-zero + trilinear resize
    to the full-res latent + re-noise, then a carved CFG forward at the
    stage-1 geometry — each stage its own jitted program, exactly like
    ``pipelines/wan_t2v.generate``. Proves the resharding across the
    shape change (two different token counts under the same 'sp' axis)
    is mesh/single-device equivalent."""
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.models.wan import (
        WanConfig, init_wan_params, make_wan_carve, wan_forward)
    from jenga_tpu.parallel.mesh import (
        make_sp_mesh, replicate, shard_params_fsdp)

    mesh = make_sp_mesh(jax.devices()[:n_devices])
    cfg = WanConfig(dim=128 * n_devices, ffn_dim=256 * n_devices,
                    freq_dim=32, num_heads=n_devices, num_layers=2,
                    text_dim=64, text_len=16, dtype="float32")
    params = init_wan_params(jax.random.PRNGKey(3), cfg)
    sharded = shard_params_fsdp(params, mesh)

    lat0, lat1 = (2, 16, 32), (2, 32, 32)    # 256 -> 512 tokens
    key = jax.random.PRNGKey(11)
    latent = jax.random.normal(key, (1, cfg.in_dim) + lat0, jnp.float32)
    noise1 = jax.random.normal(jax.random.fold_in(key, 1),
                               (1, cfg.in_dim) + lat1, jnp.float32)
    ctx2 = jax.random.normal(jax.random.fold_in(key, 2),
                             (2, cfg.text_len, cfg.text_dim), jnp.float32)

    def stage_carve(lat):
        grid = (lat[0], lat[1] // 2, lat[2] // 2)
        plan = build_curve_plan(grid, "sliced", 128)
        return make_wan_carve(cfg, plan, sa_drop_rate=0.5, p_remain=0.9,
                              q_rows=2, joint_sel=True)

    carve0, carve1 = stage_carve(lat0), stage_carve(lat1)
    sig0, sig1 = 0.8, 0.6

    def stage0(params, latent, ctx2, mesh):
        x2 = jnp.concatenate([latent, latent])
        t2 = jnp.full((2,), 800.0, jnp.float32)
        v2 = wan_forward(params, cfg, x2, t2, ctx2, carve=carve0, mesh=mesh)
        v = v2[1:2] + 5.0 * (v2[0:1] - v2[1:2])
        clean = latent - sig0 * v                     # to-zero
        clean = jax.image.resize(clean, (1, cfg.in_dim) + lat1,
                                 method="trilinear")
        return (1.0 - sig1) * clean + sig1 * noise1   # re-noise

    def stage1(params, latent, ctx2, mesh):
        x2 = jnp.concatenate([latent, latent])
        t2 = jnp.full((2,), 600.0, jnp.float32)
        v2 = wan_forward(params, cfg, x2, t2, ctx2, carve=carve1, mesh=mesh)
        return v2[1:2] + 5.0 * (v2[0:1] - v2[1:2])

    def both(params, latent, ctx2, mesh):
        mid = jax.jit(lambda p, x, c: stage0(p, x, c, mesh))(
            params, latent, ctx2)
        return jax.jit(lambda p, x, c: stage1(p, x, c, mesh))(
            params, mid, ctx2)

    out = both(sharded, replicate(latent, mesh), replicate(ctx2, mesh),
               mesh)
    ref = both(params, latent, ctx2, None)
    _check(out, ref, "wan turbo stage switch", atol=5e-4)


def _hy_case(n_devices: int, heads: int, q_rows: int, label: str,
             sa_drop_rate: float = 0.6, joint_sel: bool = False,
             grid=(4, 8, 12), lat=(4, 16, 24), ring: int = 1,
             i2v_condition_type=None) -> None:
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.models.hyvideo import (
        HYVideoConfig, init_hyvideo_params, make_hy_carve, hyvideo_forward)
    from jenga_tpu.parallel.mesh import make_sp_mesh, replicate, \
        shard_params_fsdp

    mesh = make_sp_mesh(jax.devices()[:n_devices], ring=ring)
    # head_dim stays 128 (the rope_dim_list sum); head COUNT varies per case
    cfg = HYVideoConfig(hidden_size=128 * heads,
                        heads_num=heads, double_blocks=1,
                        single_blocks=1, text_states_dim=128,
                        text_states_dim_2=32, dtype="float32",
                        i2v_condition_type=i2v_condition_type)
    params = init_hyvideo_params(jax.random.PRNGKey(1), cfg)
    sharded = shard_params_fsdp(params, mesh)

    txt_len = 256      # 2 trailing text blocks
    plan = build_curve_plan(grid, "gilbert", 128)
    carve = make_hy_carve(cfg, plan, sa_drop_rate=sa_drop_rate,
                          p_remain=0.5, text_amp=0.5, txt_block_num=2,
                          q_rows=q_rows, joint_sel=joint_sel)

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (1, cfg.in_channels) + lat, jnp.float32)
    t = jnp.array([500.0], jnp.float32)
    txt = jax.random.normal(jax.random.fold_in(key, 1),
                            (1, txt_len, cfg.text_states_dim), jnp.float32)
    tmask = jnp.ones((1, txt_len), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 2),
                             (1, cfg.text_states_dim_2), jnp.float32)

    def fwd(params, x, txt, tmask, txt2, mesh):
        return hyvideo_forward(params, cfg, x, t, txt, tmask, txt2,
                               carve=carve, mesh=mesh)

    out = jax.jit(lambda p, a, b, c, d: fwd(p, a, b, c, d, mesh))(
        sharded, replicate(x, mesh), replicate(txt, mesh),
        replicate(tmask, mesh), replicate(txt2, mesh))
    ref = jax.jit(lambda p, a, b, c, d: fwd(p, a, b, c, d, None))(
        params, x, txt, tmask, txt2)
    _check(out, ref, label)


def hyvideo_step(n_devices: int) -> None:
    """Carved HY MMDiT forward over the mesh in the PRODUCTION kernel
    configuration: joint 8-row group selection (``joint_sel=True``)
    feeding the all-member shared-gather kernel, with joint text blocks
    and a nonzero text-amp bias — the exact headline-bench path
    (VERDICT r2 item 5; q_rows=8 became the measured winner with the
    fixed-max epilogue). 2048 img tokens = 16 query blocks = 2 full
    8-row groups (+ the padded text group)."""
    _hy_case(n_devices, heads=n_devices, q_rows=8, label="hy ulysses q8 joint",
             joint_sel=True, grid=(4, 16, 32), lat=(4, 32, 64))


def hyvideo_q16(n_devices: int) -> None:
    """q_rows=16 all-member: the widest shared-gather group (2048-token
    joint selection granularity, no membership words — the supported
    bandwidth-lean mode, tests/test_sparse_attention.py TestGroupedQ16).
    4096 img tokens = 32 query blocks = 2 full 16-row groups."""
    _hy_case(n_devices, heads=n_devices, q_rows=16,
             label="hy ulysses q16 joint", joint_sel=True,
             grid=(8, 16, 32), lat=(8, 32, 64))


def hyvideo_i2v_token_replace(n_devices: int) -> None:
    """HY-I2V token_replace under the mesh: first-frame tokens take the
    t=0 modulation vector through the carved Ulysses path (the tr mask
    interacts with the curve reorder and the per-device token shards;
    never exercised sharded before r5). Production q8 joint selection."""
    _hy_case(n_devices, heads=n_devices, q_rows=8,
             label="hy i2v token_replace", joint_sel=True,
             grid=(4, 16, 32), lat=(4, 32, 64),
             i2v_condition_type="token_replace")


def hyvideo_ring_ulysses(n_devices: int) -> None:
    """Explicit ring x ulysses 2-D mesh (ring outer, sp inner): dense
    joint attention composed over both axes — img tokens sharded over
    ring x sp, replicated text KV folded per ring step
    (`/root/reference/hyvideo/modules/xdit_ring_atten.py:226-429`).
    Dense because carving requires ring == 1 by design (loud warning +
    degradation otherwise)."""
    ring = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    _hy_case(n_devices, heads=max(n_devices // ring, 1), q_rows=1,
             label="hy ring x ulysses", sa_drop_rate=0.0, ring=ring,
             grid=(4, 16, 32), lat=(4, 32, 64))


def hyvideo_ring_fallback(n_devices: int) -> None:
    """Head count not divisible by the mesh: joint attention runs as ring
    attention with replicated text KV (`models/hyvideo.py`), which must
    still match the single-device forward. Dense (sa_drop_rate=0): with
    carving active this mesh/heads mismatch degrades to the same dense
    ring (with a loud warning), so the dense case is the one with an
    equivalent single-device program to compare against."""
    heads = n_devices + n_devices // 2 if n_devices > 1 else 1
    _hy_case(n_devices, heads=heads, q_rows=1, label="hy ring fallback",
             sa_drop_rate=0.0)


def main() -> None:
    n = _N
    assert len(jax.devices()) >= n and jax.devices()[0].platform == "cpu", \
        f"expected {n} CPU devices, got {jax.devices()}"
    for case in (wan_step, wan_turbo_switch, hyvideo_step, hyvideo_q16,
                 hyvideo_i2v_token_replace, hyvideo_ring_ulysses,
                 hyvideo_ring_fallback):
        case(n)
        print(f"dryrun case ok: {case.__name__}", flush=True)
    print("dryrun ok")


if __name__ == "__main__":
    main()
