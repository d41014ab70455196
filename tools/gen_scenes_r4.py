"""Materialize the round-3/4 BASELINE-scale synthetic dataset.

408 training scenes (scene_1000..1407) + 12 validation (1408..1419) +
3 held-out eval scenes (2100..2102), 120 frames each at 144x144, using
the full variety fixture zoo (tecogan_tpu.data.synthetic).  Matches the
layout tools/run_convergence_r3.sh documents; reference dataset anchor:
408 UCF101-derived scenes x 120 frames (/root/reference/README.md:16,19).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tecogan_tpu.data.synthetic import write_synthetic_scene_folders  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/data_r4/scenes")
    p.add_argument("--size", type=int, default=144)
    args = p.parse_args()

    t0 = time.time()
    # train + val in one contiguous block: 1000..1419
    write_synthetic_scene_folders(
        args.root, num_scenes=420, size=args.size, start_index=1000,
        variety=True, seed_offset=0)
    # held-out eval scenes, disjoint seeds
    write_synthetic_scene_folders(
        args.root, num_scenes=3, size=args.size, start_index=2100,
        variety=True, seed_offset=1000)
    print(f"done in {time.time() - t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
