"""Export a training checkpoint to a params-only artifact for
committing (reproducible eval without the ~2x optimizer state).

Usage: python scripts/export_ckpt.py model/cartpole_deqmpc [checkpoints/]
The artifact loads through the normal `--load --ckpt` path
(`load_checkpoint` tolerates a missing opt_state).
"""
import os
import pickle
import sys


def main():
    src = sys.argv[1]
    dst_dir = sys.argv[2] if len(sys.argv) > 2 else "checkpoints"
    with open(src, "rb") as f:
        blob = pickle.load(f)
    out = {"params": blob["params"], "opt_state": None,
           "step": blob.get("step", 0), "args": blob.get("args")}
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(src))
    with open(dst, "wb") as f:
        pickle.dump(out, f)
    print(f"{src} ({os.path.getsize(src)//2**20} MiB) -> "
          f"{dst} ({os.path.getsize(dst)//2**20} MiB), step {out['step']}")


if __name__ == "__main__":
    main()
