"""Profiling and debug-capture hooks.

The reference gates ``info_span!`` tracing behind a cargo feature and drives
RenderDoc/Metal GPU captures from a ``DebugSettings`` resource
(render/mod.rs:2425-2533). The TPU equivalents: ``jax.named_scope`` /
``jax.profiler.TraceAnnotation`` for spans (visible in xprof traces), and
``jax.profiler.start_trace``/``stop_trace`` for whole-frame device captures,
triggered by the same DebugSettings-shaped knobs.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field

import jax

__all__ = ["profile_span", "DebugSettings"]


@contextlib.contextmanager
def profile_span(name: str):
    """Annotate a host+device span (≈ bevy info_span! + GPU debug group)."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


@dataclass
class DebugSettings:
    """Capture control (reference: DebugSettings, render/mod.rs:2425-2463).

    Set ``start_capture_this_frame`` (or ``start_capture_on_new_effect``) and
    attach to a :class:`~bevy_hanabi_tpu.runtime.HanabiScene`; the scene
    starts a ``jax.profiler`` trace at the next update and stops it after
    ``capture_frame_count`` frames. Traces land in ``capture_dir`` and open
    in XProf/TensorBoard.
    """

    start_capture_this_frame: bool = False
    start_capture_on_new_effect: bool = False
    capture_frame_count: int = 1
    capture_dir: str = "/tmp/hanabi_tpu_trace"
    # Debug-mode validation (≈ the reference running wgpu VALIDATION in
    # debug/test builds, test_utils.rs:150): when True, HanabiScene steps
    # through checkify-instrumented executables that trap out-of-bounds
    # gathers and non-finite float production — a poison read
    # (0xFFFFFFFF bit-fill == f32 NaN, effect_cache.rs:270-296) surfaces
    # as a ValidationError at the frame that consumed it instead of
    # corrupting trajectories silently. render() additionally asserts the
    # framebuffer is finite. Zero overhead when False: the instrumented
    # executables are only built (and only run) while validation is on.
    validate: bool = False

    # internal
    _frames_remaining: int = field(default=0, repr=False)
    _active: bool = field(default=False, repr=False)

    def on_frame_start(self, new_effect_added: bool) -> None:
        should_start = self.start_capture_this_frame or (
            self.start_capture_on_new_effect and new_effect_added
        )
        if should_start and not self._active:
            jax.profiler.start_trace(self.capture_dir)
            self._active = True
            self._frames_remaining = max(1, int(self.capture_frame_count))
        self.start_capture_this_frame = False

    def on_frame_end(self) -> None:
        if not self._active:
            return
        self._frames_remaining -= 1
        if self._frames_remaining <= 0:
            jax.profiler.stop_trace()
            self._active = False

    @property
    def is_capturing(self) -> bool:
        return self._active
