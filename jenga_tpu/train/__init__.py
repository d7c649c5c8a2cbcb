"""Training scaffolding: flow-matching transport, LoRA, dataset, steps.

TPU-native counterpart of the reference's I2V fine-tuning stack
(`/root/reference/hyvideo_i2v/diffusion/flow/` transport library,
``dataset/video_loader.py``, ``utils/train_utils.py`` LoRA plumbing,
``ds_config.py``): deepspeed ZeRO maps to FSDP-style ``NamedSharding``
over the mesh (see ``jenga_tpu.parallel.mesh.shard_params_fsdp``), the
engine loop maps to an optax-jitted pure train step.
"""

from __future__ import annotations


import jax

from .transport import TransportConfig, training_loss
from .lora import apply_lora, init_lora

__all__ = ["TransportConfig", "training_loss", "init_lora", "apply_lora",
           "make_lora_train_step"]


def make_lora_train_step(model_apply, tcfg: TransportConfig, optimizer,
                         i2v_condition_type: str | None = None):
    """Build a jitted LoRA fine-tuning step.

    ``model_apply(params, xt, t, batch)`` runs the DiT with the (merged)
    weights; only the LoRA tree receives gradients/updates, the base tree
    is frozen — the functional equivalent of the reference's
    requires_grad_(False) + peft adapters
    (`/root/reference/hyvideo_i2v/utils/train_utils.py`).

    Carve-bearing forwards train too: the Pallas kernels' backward is a
    recompute through the jnp oracle masked by the same selection
    (``ops/sparse_autodiff.py``) — O(S * Skv) memory per head slice, so
    pair video-length sequences with ``remat=True`` on the trunk.

    Returns ``step(lora, opt_state, base_params, batch, key)
    -> (lora, opt_state, loss)``.
    """

    def loss_fn(lora, base_params, batch, key):
        params = apply_lora(base_params, lora)

        def model_fn(xt, t):
            return model_apply(params, xt, t, batch)

        loss, _ = training_loss(
            tcfg, model_fn, key, batch["latents"],
            i2v_condition_type=i2v_condition_type,
            cond_latents=batch.get("cond_latents"))
        return loss.mean()

    @jax.jit
    def step(lora, opt_state, base_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(lora, base_params,
                                                  batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        import optax
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step
