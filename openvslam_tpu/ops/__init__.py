"""Device-side numeric kernels (pure jnp / pallas, all batched, all static-shape)."""
