"""uspace_tpu: TPU-native latent flow matching with latent-space editing.

A JAX/XLA/Pallas re-design of the capabilities of `dongzhuoyao/uspace`
(AAAI 2024, "Latent Space Editing in Transformer-based Flow Matching"):

- Conditional flow-matching (OT-CFM) training of U-ViT / U-ViT-T2I / SD-UNet
  velocity fields over Stable-Diffusion VAE latents.
- ODE sampling (fixed-step Euler/midpoint/rk4 as ``lax.scan``; adaptive
  dopri5/bosh3/heun as ``lax.while_loop``) and exact inversion by
  reverse-time integration — fully on-device, one compiled program.
- Latent-space editing: u-space semantic directions (attribute deltas,
  per-timestep PCA) injected mid-trajectory as tensor operands, and
  prompt-to-prompt attention editing folded into the attention kernel.
- Data-parallel / tensor-parallel training over a ``jax.sharding.Mesh``.

This is a ground-up TPU-first design, not a port: editing hooks are pure
tensor transformations threaded through compiled loops instead of the
reference's filesystem side effects (`/root/reference/libs/dissection.py`).
"""

__version__ = "0.1.0"


def _respect_jax_platforms_env() -> None:
    """Re-assert the JAX_PLATFORMS env var over programmatic overrides.

    Some environments install a sitecustomize hook that calls
    ``jax.config.update("jax_platforms", ...)`` in every process, which
    silently overrides the user's explicit ``JAX_PLATFORMS=cpu``. If the
    env var is set, make it win (it is the documented user contract).
    No-op when the env var is unset or backends already initialized.
    """
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax

        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass


_respect_jax_platforms_env()
