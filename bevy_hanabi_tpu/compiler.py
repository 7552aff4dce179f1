"""Expression-graph → JAX tracing evaluator.

This is the TPU replacement for the reference's shader compiler
(``EffectShaderSources::generate``, /root/reference/src/lib.rs:805-1335, and
the ``EvalContext`` trait, graph/expr.rs:839-906). The reference evaluates the
Expr graph to WGSL *strings* and splices them into shader templates; here the
graph is evaluated to **JAX arrays during tracing**, so `jax.jit` + XLA play
the role of ShaderCache + pipeline specialization:

* handle-level memoization ≈ the reference's local-var CSE cache
  (modifier/mod.rs:309-319); side-effecting (rand) exprs are re-evaluated per
  use, matching graph/expr.rs:1049-1064;
* one compiled XLA executable per (layout, module) signature ≈ one
  specialized pipeline per generated shader.

Array conventions: per-particle arrays are *batched* — scalars ``[N]``,
vectors ``[N, k]``. Literals/builtins stay unbatched (``[]`` / ``[k]``) and
broadcast lazily; XLA fuses the broadcasts away.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from .attributes import Attribute
from .graph.expr import BinaryOp, BuiltInOp, Expr, ExprHandle, Module, TernaryOp, UnaryOp
from .ops import rng
from .values import (
    BOOL,
    FLOAT,
    INT,
    UINT,
    ScalarType,
    ValueType,
    VectorType,
    num_lanes,
)

__all__ = ["SimParams", "EvalContext", "eval_expr", "InitContext", "UpdateContext", "RenderContext"]


_NP_DTYPE = {
    BOOL: jnp.bool_,
    FLOAT: jnp.float32,
    INT: jnp.int32,
    UINT: jnp.uint32,
}


@dataclass
class SimParams:
    """Per-frame simulation uniforms (reference: GpuSimParams render/mod.rs:218).

    All fields are scalar jnp arrays (or python floats) so changing them never
    retraces the jitted step.
    """

    time: Any = 0.0
    delta_time: Any = 1.0 / 60.0
    virtual_time: Any = None
    virtual_delta_time: Any = None
    real_time: Any = None
    real_delta_time: Any = None

    def get(self, op: BuiltInOp):
        if op is BuiltInOp.TIME:
            return jnp.float32(self.time)
        if op is BuiltInOp.DELTA_TIME:
            return jnp.float32(self.delta_time)
        if op is BuiltInOp.VIRTUAL_TIME:
            v = self.virtual_time if self.virtual_time is not None else self.time
            return jnp.float32(v)
        if op is BuiltInOp.VIRTUAL_DELTA_TIME:
            v = (
                self.virtual_delta_time
                if self.virtual_delta_time is not None
                else self.delta_time
            )
            return jnp.float32(v)
        if op is BuiltInOp.REAL_TIME:
            v = self.real_time if self.real_time is not None else self.time
            return jnp.float32(v)
        if op is BuiltInOp.REAL_DELTA_TIME:
            v = (
                self.real_delta_time
                if self.real_delta_time is not None
                else self.delta_time
            )
            return jnp.float32(v)
        raise KeyError(op)


# SimParams is a pytree so jitted steps take it as a runtime argument —
# time/dt changes never retrace (the reference's GpuSimParams uniform).
jax.tree_util.register_dataclass(
    SimParams,
    data_fields=[
        "time",
        "delta_time",
        "virtual_time",
        "virtual_delta_time",
        "real_time",
        "real_delta_time",
    ],
    meta_fields=[],
)


class EvalContext:
    """Evaluation environment for one pass over one effect's particles.

    The reference's ``ShaderWriter`` (init/update) and ``RenderContext``
    (render) both map onto this, differentiated by :attr:`context_name` and
    which optional fields are populated.
    """

    context_name = "generic"

    def __init__(
        self,
        module: Module,
        particle: Dict[str, jnp.ndarray],
        seed: jnp.ndarray,
        sim: SimParams = None,
        properties: Optional[Dict[str, Any]] = None,
        parent_particle: Optional[Dict[str, jnp.ndarray]] = None,
        particle_index: Optional[jnp.ndarray] = None,
        alive: Optional[jnp.ndarray] = None,
        alpha_cutoff: Optional[Any] = None,
        textures: Optional[List[jnp.ndarray]] = None,
        constant_hook=None,
    ) -> None:
        self.module = module
        self.particle = particle
        self.seed = jnp.asarray(seed, jnp.uint32)
        self.sim = sim if sim is not None else SimParams()
        self.properties = properties or {}
        self.parent_particle = parent_particle
        self.particle_index = particle_index
        self.alive = alive
        self.alpha_cutoff = alpha_cutoff
        self.textures = textures or []
        # Optional transform applied to non-scalar constants (literals,
        # defaults). Pallas kernels set this to re-materialize array
        # constants from traced scalars (Mosaic only allows scalar captures).
        self.constant_hook = constant_hook
        self._memo: Dict[ExprHandle, jnp.ndarray] = {}

    # -- attribute store ---------------------------------------------------

    def get_attr(self, name: str) -> jnp.ndarray:
        if name == "id":
            if self.particle_index is None:
                raise ValueError("particle_index not available in this context")
            return self.particle_index
        if name not in self.particle:
            raise KeyError(
                f"attribute {name!r} not in particle layout {sorted(self.particle)}"
            )
        return self.particle[name]

    def set_attr(self, name: str, value: jnp.ndarray) -> None:
        """Write an attribute (modifiers use this; invalidates memo of reads)."""
        attr = Attribute.from_name(name)
        dtype = _NP_DTYPE[attr.value_type if isinstance(attr.value_type, ScalarType) else attr.value_type.elem_type]
        value = jnp.asarray(value, dtype)
        ref = self.particle[name]
        self.particle[name] = jnp.broadcast_to(value, ref.shape)
        # Reads of this attribute may be memoized; drop stale entries.
        stale = [
            h
            for h in self._memo
            if self.module.get(h).kind in ("attribute",)
            and self.module.get(h).name == name
        ]
        for h in stale:
            del self._memo[h]
        # Conservatively drop memoized results of non-leaf exprs: they may
        # depend on the attribute through any path.
        for h in [h for h in self._memo if self.module.get(h).args]:
            del self._memo[h]

    def get_property(self, name: str) -> jnp.ndarray:
        decls = self.module.properties()
        if name not in decls:
            raise KeyError(f"property {name!r} not declared on module")
        default = decls[name]
        raw = self.properties.get(name)
        vt = default.value_type
        dtype = _NP_DTYPE[vt if isinstance(vt, ScalarType) else vt.elem_type]
        if raw is None:
            return jnp.asarray(default.to_numpy(), dtype)
        out = jnp.asarray(raw, dtype)
        expected = default.to_numpy().shape
        if out.shape != expected and out.shape[-len(expected) or 99 :] != expected:
            raise ValueError(
                f"property {name!r} expects shape {expected} "
                f"(or batched ...x{expected}), got {out.shape}"
            )
        return out

    # -- rand --------------------------------------------------------------

    def draw(self, vt: ValueType):
        count = num_lanes(vt)
        if isinstance(vt, ScalarType) and vt is not FLOAT:
            # Integer/bool variants (reference names urand/irand/brand).
            self.seed = rng.pcg_hash(self.seed)
            bits = rng.pcg_hash(self.seed)
            if vt is UINT:
                return bits
            if vt is INT:
                return bits.astype(jnp.int32)
            return rng.to_float01(bits) < 0.5
        if isinstance(vt, VectorType) and vt.elem_type is not FLOAT:
            outs = [self.draw(vt.elem_type) for _ in range(count)]
            return jnp.stack(outs, axis=-1)
        self.seed, v = rng.rand_vec(self.seed, count)
        return v

    def eval(self, handle: ExprHandle) -> jnp.ndarray:
        return eval_expr(self.module, handle, self)

    def eval_vec3(self, handle: ExprHandle) -> jnp.ndarray:
        v = self.eval(handle)
        if v.shape[-1:] != (3,):
            raise ValueError(f"expected vec3 result, got shape {v.shape}")
        return v


class InitContext(EvalContext):
    """Init-pass evaluation (reference: ShaderWriter in Init context).

    ``particle`` holds attribute arrays being initialized (starting at their
    registry defaults); modifiers overwrite them via :meth:`set_attr`.
    """

    context_name = "init"


class UpdateContext(EvalContext):
    """Update-pass evaluation (reference: ShaderWriter in Update context).

    Tracks the alive mask functionally: ``alive`` is reassigned by
    :meth:`kill`; ``was_alive`` is the mask at pass start (used by
    ``EventEmitCondition::OnDie``, reference modifier/mod.rs:692).
    Emitted GPU spawn events accumulate in :attr:`events_out` as
    ``(channel, mask, count)`` tuples consumed by the runtime.
    """

    context_name = "update"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.alive is None:
            raise ValueError("UpdateContext requires an alive mask")
        self.was_alive = self.alive
        self.events_out: list = []

    def kill(self, mask: jnp.ndarray) -> None:
        """Kill particles where ``mask`` is True (reference: is_alive=false)."""
        self.alive = jnp.logical_and(self.alive, jnp.logical_not(mask))
        # IS_ALIVE builtin reads are memoized as side-effect-free; a later
        # modifier reading is_alive must observe the post-kill mask. Drop
        # memoized IS_ALIVE leaves and (conservatively) every non-leaf
        # result that may depend on them — same sweep as set_attr.
        stale = [
            h
            for h in self._memo
            if (
                self.module.get(h).kind == "builtin"
                and self.module.get(h).builtin is BuiltInOp.IS_ALIVE
            )
            or self.module.get(h).args
        ]
        for h in stale:
            del self._memo[h]

    def emit_events(self, channel: int, count: jnp.ndarray, condition: str) -> None:
        if condition == "always":
            mask = self.alive
        elif condition == "on_die":
            mask = jnp.logical_and(self.was_alive, jnp.logical_not(self.alive))
        else:
            raise ValueError(f"unknown event emit condition {condition!r}")
        count = jnp.broadcast_to(jnp.asarray(count, jnp.uint32), mask.shape)
        self.events_out.append((channel, mask, count))


class RenderContext(EvalContext):
    """Render extraction (reference: RenderContext, modifier/mod.rs:371-556).

    Render modifiers mutate the per-particle render outputs below; the
    rasterizer consumes them. Defaults mirror the reference's render input
    defaults (lib.rs:867-951): color from COLOR/HDR_COLOR attribute or
    white, size from SIZE/SIZE2/SIZE3 or 1, axes from the camera.
    """

    context_name = "render"

    def __init__(self, *args, camera=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.camera = camera
        n = None
        for v in self.particle.values():
            n = v.shape[0]
            break
        self._n = n
        # Mutable render outputs (batched [N, ...]).
        self.color: Optional[jnp.ndarray] = None  # vec4
        self.size: Optional[jnp.ndarray] = None  # vec3
        self.axis_x: Optional[jnp.ndarray] = None
        self.axis_y: Optional[jnp.ndarray] = None
        self.axis_z: Optional[jnp.ndarray] = None
        self.sprite_grid_size: Optional[tuple] = None  # (cols, rows)
        self.needs_uv: bool = False
        self.roundness: Optional[jnp.ndarray] = None
        self.screen_space_size: bool = False
        self.texture_layers: list = []  # [(slot, ImageSampleMapping)]
        # Mesh-normal lighting handshake: extraction sets mesh_has_normals
        # when the asset's mesh carries per-vertex normals; a lighting
        # render modifier may then DEFER its shading to the rasterizer by
        # setting mesh_lighting = ((lx,ly,lz), band) instead of multiplying
        # the per-particle color (normals vary per fragment on a mesh).
        self.mesh_has_normals: bool = False
        self.mesh_lighting: Optional[tuple] = None

    @property
    def num_particles(self) -> int:
        return self._n


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------


def _is_vec(module: Module, h: ExprHandle) -> bool:
    return isinstance(module.infer_type(h), VectorType)


def _align_scalar_vec(a, a_is_vec: bool, b, b_is_vec: bool):
    """Insert a trailing lane axis on a batched scalar paired with a vector."""
    if a_is_vec and not b_is_vec and jnp.ndim(b) >= 1:
        b = b[..., None]
    if b_is_vec and not a_is_vec and jnp.ndim(a) >= 1:
        a = a[..., None]
    return a, b


def _promote(a, b):
    """Gentle numeric promotion (int+float → float32). WGSL would reject the
    mix outright; authoring from Python is friendlier with promotion."""
    if a.dtype == jnp.bool_ or b.dtype == jnp.bool_:
        return a, b
    if a.dtype != b.dtype:
        if jnp.issubdtype(a.dtype, jnp.floating) or jnp.issubdtype(
            b.dtype, jnp.floating
        ):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
        else:
            # int/uint mix: keep unsigned if either is unsigned
            t = jnp.uint32 if (a.dtype == jnp.uint32 or b.dtype == jnp.uint32) else jnp.int32
            a, b = a.astype(t), b.astype(t)
    return a, b


def eval_expr(module: Module, handle: ExprHandle, ctx: EvalContext) -> jnp.ndarray:
    # Every handle memoizes within one context, INCLUDING side-effecting
    # (rand) exprs — the reference stores those in a local shader var and
    # its expr_cache explicitly refuses to re-evaluate on a cache hit "to
    # prevent any duplicate side-effect" (modifier/mod.rs:309-313,
    # graph/expr.rs:1044-1048). Reusing one rand handle therefore yields
    # ONE draw per particle, shared by every use; independent draws need
    # distinct expr handles (call writer.rand() again).
    e = module.get(handle)
    if handle in ctx._memo:
        return ctx._memo[handle]
    out = _eval(module, e, handle, ctx)
    ctx._memo[handle] = out
    return out


def _eval(module: Module, e: Expr, handle: ExprHandle, ctx: EvalContext) -> jnp.ndarray:
    if e.kind == "literal":
        v = e.value
        vt = v.value_type
        dtype = _NP_DTYPE[vt if isinstance(vt, ScalarType) else vt.elem_type]
        import numpy as _np

        npv = _np.asarray(v.to_numpy(), dtype)
        if ctx.constant_hook is not None and npv.ndim > 0:
            # hand the raw numpy value to the hook BEFORE jnp lifts it into
            # the trace as an array constant (pallas can't capture those)
            return ctx.constant_hook(npv)
        return jnp.asarray(npv)

    if e.kind == "attribute":
        return ctx.get_attr(e.name)

    if e.kind == "parent_attribute":
        if ctx.parent_particle is None:
            raise ValueError(
                f"parent attribute {e.name!r} used but effect has no parent"
            )
        if e.name not in ctx.parent_particle:
            raise KeyError(f"parent layout lacks attribute {e.name!r}")
        return ctx.parent_particle[e.name]

    if e.kind == "property":
        return ctx.get_property(e.name)

    if e.kind == "builtin":
        op = e.builtin
        if op is BuiltInOp.RAND:
            return ctx.draw(e.rand_type)
        if op is BuiltInOp.ALPHA_CUTOFF:
            if ctx.alpha_cutoff is None:
                raise ValueError("alpha_cutoff only available in render context")
            return jnp.asarray(ctx.alpha_cutoff, jnp.float32)
        if op is BuiltInOp.IS_ALIVE:
            if ctx.alive is None:
                raise ValueError("is_alive only available in update context")
            return ctx.alive
        if op is BuiltInOp.PARTICLE_INDEX:
            if ctx.particle_index is None:
                raise ValueError("particle_index not available in this context")
            return ctx.particle_index
        return ctx.sim.get(op)

    if e.kind == "cast":
        x = eval_expr(module, e.args[0], ctx)
        vt = e.target_type
        elem = vt if isinstance(vt, ScalarType) else vt.elem_type
        return x.astype(_NP_DTYPE[elem])

    if e.kind == "texture_sample":
        uv = eval_expr(module, e.args[0], ctx)
        return _sample_texture(ctx, e.texture_slot, uv)

    if e.kind == "unary":
        return _eval_unary(module, e, ctx)
    if e.kind == "binary":
        return _eval_binary(module, e, ctx)
    if e.kind == "ternary":
        return _eval_ternary(module, e, ctx)
    raise ValueError(f"unknown expr kind {e.kind!r}")


def _eval_unary(module: Module, e: Expr, ctx: EvalContext) -> jnp.ndarray:
    op = e.op
    arg_h = e.args[0]
    x = eval_expr(module, arg_h, ctx)
    is_vec = _is_vec(module, arg_h)

    if op is UnaryOp.ABS:
        return jnp.abs(x)
    if op is UnaryOp.ACOS:
        return jnp.arccos(x)
    if op is UnaryOp.ASIN:
        return jnp.arcsin(x)
    if op is UnaryOp.ATAN:
        return jnp.arctan(x)
    if op is UnaryOp.ALL:
        return jnp.all(x, axis=-1) if is_vec else x
    if op is UnaryOp.ANY:
        return jnp.any(x, axis=-1) if is_vec else x
    if op is UnaryOp.CEIL:
        return jnp.ceil(x)
    if op is UnaryOp.COS:
        return jnp.cos(x)
    if op is UnaryOp.EXP:
        return jnp.exp(x)
    if op is UnaryOp.EXP2:
        return jnp.exp2(x)
    if op is UnaryOp.FLOOR:
        return jnp.floor(x)
    if op is UnaryOp.FRACT:
        return x - jnp.floor(x)
    if op is UnaryOp.INV_SQRT:
        return jnp.float32(1.0) / jnp.sqrt(x)
    if op is UnaryOp.LENGTH:
        return jnp.sqrt(jnp.sum(x * x, axis=-1)) if is_vec else jnp.abs(x)
    if op is UnaryOp.LOG:
        return jnp.log(x)
    if op is UnaryOp.LOG2:
        return jnp.log2(x)
    if op is UnaryOp.NORMALIZE:
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        return x / n
    if op is UnaryOp.PACK4X8SNORM:
        q = jnp.round(jnp.clip(x, -1.0, 1.0) * 127.0).astype(jnp.int32)
        b = (q.astype(jnp.uint32)) & jnp.uint32(0xFF)
        return (
            b[..., 0]
            | (b[..., 1] << jnp.uint32(8))
            | (b[..., 2] << jnp.uint32(16))
            | (b[..., 3] << jnp.uint32(24))
        )
    if op is UnaryOp.PACK4X8UNORM:
        q = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint32)
        return (
            q[..., 0]
            | (q[..., 1] << jnp.uint32(8))
            | (q[..., 2] << jnp.uint32(16))
            | (q[..., 3] << jnp.uint32(24))
        )
    if op is UnaryOp.ROUND:
        return jnp.round(x)
    if op is UnaryOp.SATURATE:
        return jnp.clip(x, 0.0, 1.0)
    if op is UnaryOp.SIGN:
        return jnp.sign(x)
    if op is UnaryOp.SIN:
        return jnp.sin(x)
    if op is UnaryOp.SQRT:
        return jnp.sqrt(x)
    if op is UnaryOp.TAN:
        return jnp.tan(x)
    if op is UnaryOp.UNPACK4X8SNORM:
        u = x.astype(jnp.uint32)
        comps = [
            ((u >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(jnp.int32)
            for i in range(4)
        ]
        comps = [jnp.where(c > 127, c - 256, c).astype(jnp.float32) / 127.0 for c in comps]
        return jnp.clip(jnp.stack(comps, axis=-1), -1.0, 1.0)
    if op is UnaryOp.UNPACK4X8UNORM:
        u = x.astype(jnp.uint32)
        comps = [
            ((u >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
            for i in range(4)
        ]
        return jnp.stack(comps, axis=-1)
    if op in (UnaryOp.X, UnaryOp.Y, UnaryOp.Z, UnaryOp.W):
        idx = {"x": 0, "y": 1, "z": 2, "w": 3}[op.value]
        if not is_vec:
            if idx == 0:
                return x
            raise ValueError(f".{op.value} on scalar expression")
        return x[..., idx]
    raise ValueError(f"unhandled unary op {op}")


def _eval_binary(module: Module, e: Expr, ctx: EvalContext) -> jnp.ndarray:
    op = e.op
    lh, rh = e.args
    lvec, rvec = _is_vec(module, lh), _is_vec(module, rh)

    # rand ops need the *types* before evaluation so draws are lane-correct.
    if op in (BinaryOp.UNIFORM_RAND, BinaryOp.NORMAL_RAND):
        a = eval_expr(module, lh, ctx)
        b = eval_expr(module, rh, ctx)
        a, b = _align_scalar_vec(a, lvec, b, rvec)
        # lane count from the VECTOR operand (either side may be the
        # scalar in uniform(lo, hi) — drawing from the left type alone
        # under-draws for uniform(scalar, vecN))
        vt = module.infer_type(lh if lvec or not rvec else rh)
        count = num_lanes(vt) if not isinstance(vt, ScalarType) else 1
        if op is BinaryOp.UNIFORM_RAND:
            ctx.seed, v = rng.rand_uniform(ctx.seed, a, b, count)
        else:
            ctx.seed, v = rng.rand_normal(ctx.seed, a, b, count)
        return v

    a = eval_expr(module, lh, ctx)
    b = eval_expr(module, rh, ctx)

    if op is BinaryOp.VEC2:
        return jnp.stack(jnp.broadcast_arrays(a, b), axis=-1)
    if op is BinaryOp.VEC4_XYZ_W:
        if jnp.ndim(b) < jnp.ndim(a):
            b = jnp.broadcast_to(b, a.shape[:-1])
        elif jnp.ndim(b) == jnp.ndim(a) and jnp.ndim(a) >= 1:
            # unbatched vec3 xyz with per-particle scalar w: batch the xyz
            a = jnp.broadcast_to(a, b.shape + a.shape[-1:])
        return jnp.concatenate([a, b[..., None]], axis=-1)
    if op is BinaryOp.CROSS:
        return jnp.cross(a, b)
    if op is BinaryOp.DOT:
        return jnp.sum(a * b, axis=-1)
    if op is BinaryOp.DISTANCE:
        d = a - b
        return jnp.sqrt(jnp.sum(d * d, axis=-1)) if lvec else jnp.abs(d)

    a, b = _align_scalar_vec(a, lvec, b, rvec)
    a2, b2 = _promote(jnp.asarray(a), jnp.asarray(b))

    if op is BinaryOp.ADD:
        return a2 + b2
    if op is BinaryOp.SUB:
        return a2 - b2
    if op is BinaryOp.MUL:
        return a2 * b2
    if op is BinaryOp.DIV:
        return a2 / b2
    if op is BinaryOp.REM:
        if jnp.issubdtype(a2.dtype, jnp.floating):
            return jnp.fmod(a2, b2)  # WGSL %: truncated modulo
        import jax.lax as lax

        return lax.rem(a2, b2)
    if op is BinaryOp.MIN:
        return jnp.minimum(a2, b2)
    if op is BinaryOp.MAX:
        return jnp.maximum(a2, b2)
    if op is BinaryOp.LT:
        return a2 < b2
    if op is BinaryOp.LE:
        return a2 <= b2
    if op is BinaryOp.GT:
        return a2 > b2
    if op is BinaryOp.GE:
        return a2 >= b2
    if op is BinaryOp.ATAN2:
        return jnp.arctan2(a2, b2)
    if op is BinaryOp.STEP:
        # step(edge, x): 0 where x < edge, else 1 (WGSL argument order)
        return jnp.where(b2 < a2, jnp.float32(0.0), jnp.float32(1.0))
    raise ValueError(f"unhandled binary op {op}")


def _eval_ternary(module: Module, e: Expr, ctx: EvalContext) -> jnp.ndarray:
    op = e.op
    ah, bh, ch = e.args
    a = eval_expr(module, ah, ctx)
    b = eval_expr(module, bh, ctx)
    c = eval_expr(module, ch, ctx)
    avec, bvec, cvec = (_is_vec(module, h) for h in e.args)

    if op is TernaryOp.VEC3:
        return jnp.stack(jnp.broadcast_arrays(a, b, c), axis=-1)
    def lane_align(x, x_is_vec, result_is_vec):
        """Add a trailing lane axis to a batched scalar mixed with vectors."""
        if result_is_vec and not x_is_vec and jnp.ndim(x) >= 1:
            return x[..., None]
        return x

    if op is TernaryOp.MIX:
        res_vec = avec or bvec
        a, b, c = (lane_align(x, v, res_vec) for x, v in ((a, avec), (b, bvec), (c, cvec)))
        return a + (b - a) * c
    if op is TernaryOp.CLAMP:
        res_vec = avec
        b = lane_align(b, bvec, res_vec)
        c = lane_align(c, cvec, res_vec)
        return jnp.clip(a, b, c)
    if op is TernaryOp.SMOOTHSTEP:
        # smoothstep(low, high, x) — result follows x
        res_vec = cvec
        a = lane_align(a, avec, res_vec)
        b = lane_align(b, bvec, res_vec)
        t = jnp.clip((c - a) / (b - a), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)
    raise ValueError(f"unhandled ternary op {op}")


def _sample_texture(ctx: EvalContext, slot: int, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture sample, repeat addressing.

    Textures are ``[H, W, 4]`` float arrays in :attr:`EvalContext.textures`.
    Equivalent of WGSL ``textureSampleLevel(t, s, uv, 0)`` used by
    ParticleTextureModifier (reference: modifier/output.rs).
    """
    if slot >= len(ctx.textures):
        raise IndexError(f"texture slot {slot} not bound ({len(ctx.textures)} bound)")
    tex = ctx.textures[slot]
    h, w = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), w)
    v0i = jnp.mod(v0.astype(jnp.int32), h)
    u1i = jnp.mod(u0i + 1, w)
    v1i = jnp.mod(v0i + 1, h)
    t00 = tex[v0i, u0i]
    t01 = tex[v0i, u1i]
    t10 = tex[v1i, u0i]
    t11 = tex[v1i, u1i]
    top = t00 + (t01 - t00) * fu
    bot = t10 + (t11 - t10) * fu
    return top + (bot - top) * fv
