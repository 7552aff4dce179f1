"""Scene checkpoint/resume.

The reference cannot checkpoint simulation state at all — particles live
only in GPU buffers (SURVEY.md §5: "no sim-state checkpointing"). Because
this framework's pools are pytrees, a full scene checkpoint is a single npz:
every instance's particle state + spawner state + the simulation clock.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from ..runtime.scene import HanabiScene

__all__ = ["save_scene_state", "load_scene_state"]


def _rng_state(rng) -> dict:
    """JSON-safe snapshot of a numpy Generator's bit-generator state."""
    return rng.bit_generator.state


def _restore_rng(rng, state: dict) -> None:
    rng.bit_generator.state = state


def save_scene_state(scene: "HanabiScene", path: str) -> None:
    arrays = {}
    # RNG streams must be part of the checkpoint, or a resumed run diverges
    # from an uninterrupted one (CpuValue resampling and per-frame seeds
    # would draw differently).
    meta = {"effects": [], "rng": {"scene": _rng_state(scene._rng)}, "clock": {
        "time": scene.clock._time,
        "virtual_time": scene.clock._virtual_time,
        "real_time": scene.clock._real_time,
        "speed": scene.clock._speed,
        "paused": scene.clock._paused,
    }}
    for inst in scene.effects():
        key = inst.name
        meta["effects"].append(key)
        if inst.rng is not None:
            meta["rng"][f"{key}/frame"] = _rng_state(inst.rng)
        if inst.spawner is not None:
            meta["rng"][f"{key}/spawner"] = _rng_state(inst.spawner.rng)
        for aname, arr in inst.pool.attrs.items():
            arrays[f"{key}/attr:{aname}"] = np.asarray(arr)
        arrays[f"{key}/alive"] = np.asarray(inst.pool.alive)
        arrays[f"{key}/seed"] = np.asarray(inst.pool.seed)
        arrays[f"{key}/counter"] = np.asarray(inst.pool.counter)
        if inst.spawner is not None:
            sp = inst.spawner
            arrays[f"{key}/spawner"] = np.asarray(
                [
                    sp.cycle_time,
                    sp.sampled_period,
                    sp.sampled_spawn_duration,
                    sp.sampled_count,
                    sp.spawn_remainder,
                    float(sp.completed_cycle_count),
                    1.0 if sp.active else 0.0,
                ]
            )
        # in-flight spawn events (emitted last frame, consumed next frame):
        # dropping them would silently lose the children they request
        for chan, ev in (inst.last_events or {}).items():
            arrays[f"{key}/event:{chan}/parent_slot"] = np.asarray(ev.parent_slot)
            arrays[f"{key}/event:{chan}/count"] = np.asarray(ev.count)
            arrays[f"{key}/event:{chan}/num_events"] = np.asarray(ev.num_events)
            for pname, parr in ev.payload.items():
                arrays[f"{key}/event:{chan}/payload:{pname}"] = np.asarray(parr)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_scene_state(scene: "HanabiScene", path: str) -> None:
    """Restore pools/spawners/clock into an already-built scene (same assets)."""
    import jax.numpy as jnp

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["__meta__"]).decode())
    for key in meta["effects"]:
        inst = scene[key]
        for aname in list(inst.pool.attrs):
            inst.pool.attrs[aname] = jnp.asarray(data[f"{key}/attr:{aname}"])
        inst.pool.alive = jnp.asarray(data[f"{key}/alive"])
        inst.pool.seed = jnp.asarray(data[f"{key}/seed"])
        inst.pool.counter = jnp.asarray(data[f"{key}/counter"])
        events: dict = {}
        prefix = f"{key}/event:"
        for k in data.files:
            if not k.startswith(prefix) or not k.endswith("/parent_slot"):
                continue
            chan = int(k[len(prefix):].split("/")[0])
            base = f"{prefix}{chan}"
            payload = {
                pk[len(base) + len("/payload:"):]: jnp.asarray(data[pk])
                for pk in data.files
                if pk.startswith(f"{base}/payload:")
            }
            from ..runtime.events import EventBuffer

            events[chan] = EventBuffer(
                jnp.asarray(data[f"{base}/parent_slot"]),
                jnp.asarray(data[f"{base}/count"]),
                jnp.asarray(data[f"{base}/num_events"]),
                payload,
            )
        inst.last_events = events
        if inst.spawner is not None and f"{key}/spawner" in data:
            s = data[f"{key}/spawner"]
            sp = inst.spawner
            sp.cycle_time = float(s[0])
            sp.sampled_period = float(s[1])
            sp.sampled_spawn_duration = float(s[2])
            sp.sampled_count = float(s[3])
            sp.spawn_remainder = float(s[4])
            sp.completed_cycle_count = int(s[5])
            sp.active = bool(s[6])
        rng_meta = meta.get("rng", {})
        if inst.rng is not None and f"{key}/frame" in rng_meta:
            _restore_rng(inst.rng, rng_meta[f"{key}/frame"])
        if inst.spawner is not None and f"{key}/spawner" in rng_meta:
            _restore_rng(inst.spawner.rng, rng_meta[f"{key}/spawner"])
    if "rng" in meta and "scene" in meta["rng"]:
        _restore_rng(scene._rng, meta["rng"]["scene"])
    clk = meta["clock"]
    scene.clock._time = clk["time"]
    scene.clock._virtual_time = clk["virtual_time"]
    scene.clock._real_time = clk["real_time"]
    scene.clock._speed = clk["speed"]
    scene.clock._paused = clk["paused"]
