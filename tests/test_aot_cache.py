"""utils/aot_cache: the tracing-skipping AOT artifact cache (the warm
adapt-a-voice floor was ~40 s of scan trace+lowering per fresh process;
SSL_BENCH.json / ROADMAP r5)."""

import numpy as np
import jax
import jax.numpy as jnp

from unitspeech_tpu.utils import aot_cache


def _fn(a, b):
    return jnp.sin(a) @ b + a.sum()


def test_miss_then_hit_same_numerics(tmp_path):
    d = str(tmp_path)
    a = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8)),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((8, 8)),
                    jnp.float32)
    r1, hit1 = aot_cache.cached_call("k", _fn, a, b, cache_dir=d)
    assert not hit1
    r2, hit2 = aot_cache.cached_call("k", _fn, a, b, cache_dir=d)
    assert hit2
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(jax.jit(_fn)(a, b)),
                               rtol=1e-6)


def test_key_covers_shapes_and_statics(tmp_path):
    d = str(tmp_path)
    a8 = jnp.ones((8, 8))
    a4 = jnp.ones((4, 4))
    _, h = aot_cache.cached_call("k", _fn, a8, a8, cache_dir=d)
    assert not h
    # different shapes -> different artifact (no bad replay)
    _, h = aot_cache.cached_call("k", _fn, a4, a4, cache_dir=d)
    assert not h
    # different key string -> different artifact
    _, h = aot_cache.cached_call("k2", _fn, a8, a8, cache_dir=d)
    assert not h
    # all three now hit independently
    assert aot_cache.cached_call("k", _fn, a8, a8, cache_dir=d)[1]
    assert aot_cache.cached_call("k", _fn, a4, a4, cache_dir=d)[1]
    assert aot_cache.cached_call("k2", _fn, a8, a8, cache_dir=d)[1]


def test_corrupt_artifact_recovers(tmp_path):
    d = str(tmp_path)
    a = jnp.ones((4, 4))
    aot_cache.cached_call("k", _fn, a, a, cache_dir=d)
    path = aot_cache.cache_path("k", (a, a), cache_dir=d)
    with open(path, "wb") as f:
        f.write(b"garbage")
    r, hit = aot_cache.cached_call("k", _fn, a, a, cache_dir=d)
    assert not hit  # fell back to a rebuild
    np.testing.assert_allclose(np.asarray(r), np.asarray(jax.jit(_fn)(a, a)),
                               rtol=1e-6)
    # rebuilt artifact replaces the corrupt one
    assert aot_cache.cached_call("k", _fn, a, a, cache_dir=d)[1]


def test_cached_fn_reusable_and_pytree_args(tmp_path):
    d = str(tmp_path)

    def tree_fn(tree, x):
        return tree["w"] @ x + tree["b"]

    tree = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    x = jnp.arange(4.0)
    f, hit = aot_cache.cached_fn("t", tree_fn, tree, x, cache_dir=d)
    assert not hit
    y1 = np.asarray(f(tree, x))
    y2 = np.asarray(f({"w": 2 * tree["w"], "b": tree["b"]}, x))
    np.testing.assert_allclose(y2, 2 * y1)
    f2, hit2 = aot_cache.cached_fn("t", tree_fn, tree, x, cache_dir=d)
    assert hit2
    np.testing.assert_array_equal(np.asarray(f2(tree, x)), y1)


def test_sharded_args_roundtrip():
    """cached_call with mesh-sharded committed inputs: either the export
    path or the silent jit fallback must produce correct results (probed:
    this jax version exports and replays them fine on the 8-device mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    x = jax.device_put(
        jnp.arange(32.0).reshape(8, 4), NamedSharding(mesh, P("data", None))
    )

    def f(a):
        return (a * 2).sum(axis=1)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        r1, _ = aot_cache.cached_call("sh", f, x, cache_dir=d)
        r2, _ = aot_cache.cached_call("sh", f, x, cache_dir=d)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(jax.jit(f)(x)))
