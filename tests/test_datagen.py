"""Data pipeline tests: merge/sample semantics, episode-boundary masks."""
import numpy as np

from deqmpc_tpu.data import merge_gt_data, sample_trajectory


def _fake_trajs(n_ep=5, ep_len=20, nx=2, nu=1, seed=0):
    rng = np.random.default_rng(seed)
    return [
        [(rng.normal(size=nx).astype(np.float32),
          rng.normal(size=nu).astype(np.float32)) for _ in range(ep_len)]
        for _ in range(n_ep)
    ]


def test_merge_marks_episode_ends():
    trajs = _fake_trajs(n_ep=3, ep_len=10)
    gt = merge_gt_data(trajs)
    assert gt["state"].shape == (30, 2)
    assert gt["mask"].shape == (30,)
    np.testing.assert_array_equal(np.where(gt["mask"] == 0)[0], [9, 19, 29])


def test_sample_shapes_and_masks():
    trajs = _fake_trajs(n_ep=4, ep_len=15)
    gt = merge_gt_data(trajs)
    rng = np.random.default_rng(1)
    batch = sample_trajectory(gt, bsz=16, H=3, T=5, rng=rng)
    assert batch["obs"].shape == (16, 3, 2)
    assert batch["state"].shape == (16, 5, 2)
    assert batch["action"].shape == (16, 5, 1)
    assert batch["mask"].shape == (16, 5)
    # masks are monotone non-increasing along the horizon (cumprod)
    d = np.diff(batch["mask"], axis=1)
    assert (d <= 0).all()


def test_history_never_crosses_episode_boundary():
    trajs = _fake_trajs(n_ep=4, ep_len=8)
    gt = merge_gt_data(trajs)
    rng = np.random.default_rng(2)
    batch = sample_trajectory(gt, bsz=32, H=4, T=3, rng=rng)
    # each obs window of length H must match a contiguous slice of some
    # single episode: verify via exact match search in the flat arrays
    flat = gt["state"]
    for b in range(32):
        w = batch["obs"][b]
        found = False
        for i in range(len(flat) - 3):
            if np.allclose(flat[i : i + 4], w):
                # boundary check: no episode end inside the history
                assert (gt["mask"][i : i + 3] != 0).all()
                found = True
                break
        assert found


def test_unwrap_angle_windows():
    import numpy as np
    from deqmpc_tpu.utils import angle_idxs_for_env, unwrap_angle_windows

    x = np.zeros((3, 5, 2))
    x[0, :, 0] = [6.2, 6.27, 0.05, 0.12, 0.2]     # crosses 2pi upward
    x[1, :, 0] = [0.15, 0.05, 6.25, 6.1, 6.0]     # crosses downward
    x[2, :, 0] = [3.0, 3.1, 3.2, 3.3, 3.4]        # no crossing
    x[:, :, 1] = 7.0                              # velocity untouched
    y = unwrap_angle_windows(x, angle_idxs_for_env("pendulum", 2))
    assert np.all(np.abs(np.diff(y[..., 0], axis=-1)) < 1.0)
    assert np.allclose(y[2], x[2])
    assert np.allclose(y[..., 1], 7.0)
    # anchored at knot 0
    assert np.allclose(y[:, 0], x[:, 0])
    # cartpole: only joint angles (idx 1..nq-1) unwrapped, not px
    x6 = np.zeros((1, 4, 6))
    x6[0, :, 1] = [6.2, 0.1, 0.3, 0.5]
    x6[0, :, 0] = [6.2, 0.1, 0.3, 0.5]  # px looks like a jump but isn't an angle
    y6 = unwrap_angle_windows(x6, angle_idxs_for_env("cartpole1link", 6))
    assert np.all(np.abs(np.diff(y6[0, :, 1])) < 1.0)
    assert np.allclose(y6[0, :, 0], x6[0, :, 0])


def test_preprocess_batch_consistency():
    import numpy as np
    from deqmpc_tpu.training.train import preprocess_batch

    rng = np.random.default_rng(0)
    state = rng.uniform(-np.pi, np.pi, (4, 5, 2))
    state[:, :, 0] = np.cumsum(rng.uniform(-0.3, 0.3, (4, 5)), axis=1)
    batch = {"state": state.copy(),
             "obs": state[:, 0].copy(),
             "action": rng.normal(size=(4, 5, 1)),
             "mask": np.ones((4, 5))}
    out = preprocess_batch("pendulum", 2, batch)
    # obs and state[:, 0] stay consistent after unnormalize+unwrap
    np.testing.assert_allclose(out["state"][:, 0], out["obs"], rtol=1e-12)
    # window continuous
    assert np.all(np.abs(np.diff(out["state"][..., 0], axis=-1)) < 1.0)
