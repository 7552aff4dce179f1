import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.compiler import EvalContext
from bevy_hanabi_tpu.graph import Module
from bevy_hanabi_tpu.graph.node import (
    AddNode,
    AttributeNode,
    ClampNode,
    LiteralNode,
    MixNode,
    MulNode,
    NodeGraph,
    NormalizeNode,
    TimeNode,
)
from bevy_hanabi_tpu.models.texutils import (
    make_anim_sprite_sheet,
    make_circle_texture,
    make_cloud_texture,
)


def test_node_graph_compiles_to_exprs():
    g = NodeGraph()
    pos = g.add(AttributeNode(A.POSITION))
    two = g.add(LiteralNode(2.0))
    scaled = g.add(MulNode())
    g.link(pos, scaled, "lhs")
    g.link(two, scaled, "rhs")
    norm = g.add(NormalizeNode())
    g.link(scaled, norm, "value")

    m = Module()
    h = g.compile(m, norm)
    particle = {"position": jnp.asarray([[3.0, 0.0, 0.0], [0.0, 4.0, 0.0]])}
    ctx = EvalContext(m, particle, jnp.zeros(2, jnp.uint32))
    out = np.asarray(ctx.eval(h))
    np.testing.assert_allclose(out, [[1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_node_graph_shared_subgraph_memoized():
    g = NodeGraph()
    t = g.add(TimeNode())
    add = g.add(AddNode())
    g.link(t, add, "lhs")
    g.link(t, add, "rhs")
    m = Module()
    h = g.compile(m, add)
    # time node built once: module has exactly 2 exprs (time + add)
    assert len(m) == 2


def test_node_graph_errors():
    g = NodeGraph()
    add = g.add(AddNode())
    with pytest.raises(KeyError):
        g.link(add, add, "nope")
    m = Module()
    with pytest.raises(ValueError):
        g.compile(m, add)  # unlinked inputs
    # cycle
    g2 = NodeGraph()
    a = g2.add(AddNode())
    b = g2.add(AddNode())
    one = g2.add(LiteralNode(1.0))
    g2.link(b, a, "lhs")
    g2.link(one, a, "rhs")
    g2.link(a, b, "lhs")
    g2.link(one, b, "rhs")
    with pytest.raises(ValueError):
        g2.compile(Module(), a)


def test_mix_clamp_nodes():
    g = NodeGraph()
    lo = g.add(LiteralNode(0.0))
    hi = g.add(LiteralNode(10.0))
    t = g.add(LiteralNode(0.25))
    mix = g.add(MixNode())
    g.link(lo, mix, "start")
    g.link(hi, mix, "end")
    g.link(t, mix, "t")
    clamp = g.add(ClampNode())
    g.link(mix, clamp, "value")
    g.link(lo, clamp, "min")
    g.link(t, clamp, "max")
    m = Module()
    h = g.compile(m, clamp)
    ctx = EvalContext(m, {}, jnp.zeros(1, jnp.uint32))
    assert float(ctx.eval(h)) == 0.25


def test_texutils():
    tex = make_circle_texture(32)
    assert tex.shape == (32, 32, 4)
    assert tex[16, 16, 3] == 1.0 and tex[0, 0, 3] == 0.0
    sheet = make_anim_sprite_sheet(frames=4, size=16)
    assert sheet.shape == (16, 64, 4)
    # first frame disc bigger than last frame
    assert sheet[8, 0:16, 3].sum() > sheet[8, 48:64, 3].sum()
    cloud = make_cloud_texture(32, seed=1)
    assert cloud.shape == (32, 32, 4)
    assert 0.0 < cloud[..., 3].mean() < 1.0
