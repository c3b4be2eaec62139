"""Data-noise augmentation for expert trajectories.

Reconstructs the behavior implied by the reference's missing
`noise_utils.py` (`train.py:67-70`: `--data_noise_type`,
`--data_noise_std`, `--data_noise_mean`): inject noise into the
sampled expert states so the policy sees off-manifold inputs.

Noise types:
  0: none
  1: additive Gaussian on the input observation only
  2: additive Gaussian on all horizon states (targets stay clean)
  3: scaled Gaussian — std proportional to per-dimension data scale
"""
from __future__ import annotations

import numpy as np


def add_data_noise(batch: dict, noise_type: int = 0, std: float = 0.05,
                   mean: float = 0.0,
                   rng: np.random.Generator | None = None) -> dict:
    if noise_type == 0:
        return batch
    rng = rng or np.random.default_rng()
    out = dict(batch)
    if noise_type == 1:
        obs = np.asarray(batch["obs"])
        out["obs"] = obs + mean + std * rng.standard_normal(obs.shape).astype(obs.dtype)
    elif noise_type == 2:
        obs = np.asarray(batch["obs"])
        out["obs"] = obs + mean + std * rng.standard_normal(obs.shape).astype(obs.dtype)
        st = np.asarray(batch["state"])
        noisy = st + mean + std * rng.standard_normal(st.shape).astype(st.dtype)
        out["state_noisy"] = noisy
    elif noise_type == 3:
        obs = np.asarray(batch["obs"])
        scale = np.std(np.asarray(batch["state"]), axis=(0, 1), keepdims=True)
        out["obs"] = obs + std * scale[0] * rng.standard_normal(obs.shape).astype(obs.dtype)
    else:
        raise ValueError(f"unknown noise_type {noise_type}")
    return out
