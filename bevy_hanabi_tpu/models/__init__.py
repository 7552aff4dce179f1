"""Prebuilt effect "models" mirroring the reference's examples/.

Each function builds an :class:`~bevy_hanabi_tpu.asset.EffectAsset`
re-creating one reference example (examples/*.rs); they double as feature
acceptance tests and benchmark configs (BASELINE.md).
"""

from .benchmarks import (  # noqa: F401
    firework_effect,
    firework_trail_effect,
    force_field_effect,
    gradient_effect,
    instancing_effect,
    ribbon_bench_effect,
    ribbon_order_check_effect,
    spawn_gravity_effect,
    textured_mesh_check_effect,
)
