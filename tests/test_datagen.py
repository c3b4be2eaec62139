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
