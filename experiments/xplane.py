"""CLI for inspecting ``*.xplane.pb`` device captures.

The wire-format decoding lives in ``bevy_hanabi_tpu.utils.xplane`` (one
copy — an earlier draft here read per-op stats off XEvent instead of
XEventMetadata and was drifting); this is just the ad-hoc
print-the-hot-ops view used while profiling:

    python experiments/xplane.py /tmp/trace/.../foo.xplane.pb
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bevy_hanabi_tpu.utils.xplane import (  # noqa: E402
    CONTAINER_CATEGORIES,
    leaf_totals,
    op_durations,
    op_stats,
)

if __name__ == "__main__":
    path = sys.argv[1]
    for key, ctr in op_durations(path).items():
        total = sum(ctr.values())
        print(f"== {key}: {total:.3f} ms total ==")
        for name, ms in ctr.most_common(12):
            print(f"  {ms:9.3f} ms ({ms / total * 100:4.1f}%)  {name[:90]}")
    stats = op_stats(path)
    if stats:
        leaf = {
            n: r
            for n, r in stats.items()
            if r["category"] not in CONTAINER_CATEGORIES
        }
        tm, tb = leaf_totals(stats)
        print(f"\n== leaf op stats: {tb / 1e6:.1f} MB, {tm:.3f} ms ==")
        for n, r in sorted(leaf.items(), key=lambda kv: -kv[1]["bytes"])[:12]:
            print(
                f"  {r['bytes'] / 1e6:9.1f} MB {r['ms']:9.3f} ms "
                f"x{r['occurrences']:<4d} [{r['category'][:18]:18s}] "
                f"{n[:60]}"
            )
