"""NCAGaussianDecoder (Experiment 5): neural-cellular-automata refinement.

Flax port of the reference NCA decoder (reference:
scripts/models/nca_gaussian_decoder.py:39-366): init-state net over spiral-
sampled features, then n_steps of {kNN(6) perceive -> update MLP ->
stochastic(p=0.5) residual update with learnable step size}, parsed into the
16-dim Gaussian state [pos3, scale3, rot6d, color3, opacity1] with depth-
locked Z.  The Python step loop becomes lax.scan; kNN is cdist + top_k.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fresnel_tpu.core.gaussians import rotation_6d_to_quaternion
from fresnel_tpu.models.blocks import fibonacci_spiral_positions
from fresnel_tpu.models.fibonacci import sample_grid_at


class NCAGaussianDecoder(nn.Module):
    feature_dim: int = 384
    n_points: int = 377
    n_steps: int = 16
    k_neighbors: int = 6
    hidden_dim: int = 128
    update_prob: float = 0.5
    state_dim: int = 16
    step_size: float = 0.1

    def setup(self):
        h, d = self.hidden_dim, self.state_dim
        self.init_state_net = nn.Sequential([
            nn.Dense(h * 2), nn.relu, nn.Dense(h), nn.relu, nn.Dense(d)])
        self.perception = nn.Sequential([
            nn.Dense(h * 2), nn.relu, nn.Dense(h), nn.relu])
        # Update rule output zero-initialized: residual learning.
        self.update_hidden = nn.Dense(h)
        self.update_out = nn.Dense(
            d, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
        self.step_size_param = self.param(
            "step_size", lambda _: jnp.asarray(self.step_size, jnp.float32))
        self.depth_offset = self.param(
            "depth_offset", lambda _: jnp.asarray(-2.0, jnp.float32))

    def _nca_step(self, state: jax.Array, mask: jax.Array) -> jax.Array:
        """state (B, N, D); mask (B, N, 1) stochastic update gate."""
        B, N, D = state.shape
        pos = state[..., :3]
        diff = pos[:, :, None, :] - pos[:, None, :, :]
        dists = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-12)
        # k+1 smallest (self included), drop self.
        _, idx = jax.lax.top_k(-dists, self.k_neighbors + 1)
        idx = idx[..., 1:]                                  # (B, N, k)
        neighbors = jax.vmap(lambda s, i: s[i])(state, idx)  # (B, N, k, D)
        perception_in = jnp.concatenate(
            [state, neighbors.reshape(B, N, -1)], -1)
        perceived = self.perception(perception_in)
        delta = self.update_out(nn.relu(self.update_hidden(perceived)))
        delta = delta * mask
        return state + self.step_size_param * delta

    def __call__(
        self,
        features: jax.Array,                 # (B, 37, 37, C)
        depth: Optional[jax.Array] = None,
        num_gaussians: Optional[int] = None,  # API parity; unused
        elevation: Optional[jax.Array] = None,
        azimuth: Optional[jax.Array] = None,
        deterministic: bool = True,
        n_steps: Optional[int] = None,
    ) -> Dict[str, jax.Array]:
        steps = self.n_steps if n_steps is None else n_steps
        B = features.shape[0]
        N, D = self.n_points, self.state_dim

        sx, sy = fibonacci_spiral_positions(N)
        coords = jnp.stack([sx, sy], -1)

        sampled = jax.vmap(lambda f: sample_grid_at(f, coords))(features)
        state = self.init_state_net(sampled)                # (B, N, D)

        if depth is not None:
            d = depth[..., 0] if depth.ndim == 4 else depth
            d_sampled = jax.vmap(
                lambda dd: sample_grid_at(dd[..., None], coords)[:, 0])(d)
        else:
            d_sampled = jnp.zeros((B, N))

        base_x = jnp.broadcast_to(sx[None], (B, N))
        base_y = jnp.broadcast_to(sy[None], (B, N))
        base_z = self.depth_offset + d_sampled * (-2.0)
        state = state.at[..., 0].set(
            base_x + jax.lax.stop_gradient(state[..., 0]) * 0.15)
        state = state.at[..., 1].set(
            base_y + jax.lax.stop_gradient(state[..., 1]) * 0.15)
        state = state.at[..., 2].set(base_z)                # Z locked to depth

        # Stochastic update masks (p=update_prob) only in training mode.
        if not deterministic:
            rng = self.make_rng("nca")
            masks = (jax.random.uniform(rng, (steps, B, N, 1))
                     < self.update_prob).astype(state.dtype)
        else:
            masks = jnp.ones((steps, B, N, 1), state.dtype)

        # Unrolled step loop: flax variable bookkeeping is a side effect that
        # cannot cross a raw lax.scan; at <=16 small-MLP steps unrolling is
        # cheap for XLA and keeps the module simple.
        for s in range(steps):
            state = self._nca_step(state, masks[s])

        positions = state[..., 0:3]
        scales = jnp.clip(
            jax.nn.softplus(jnp.clip(state[..., 3:6], -10, 20) + 1.0) * 0.15,
            1e-6, 2.0)
        rotations = rotation_6d_to_quaternion(state[..., 6:12])
        colors = jax.nn.sigmoid(state[..., 12:15])
        opacities = jax.nn.sigmoid(state[..., 15])
        return {"positions": positions, "scales": scales,
                "rotations": rotations, "colors": colors,
                "opacities": opacities}
