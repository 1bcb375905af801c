"""Reference .caffemodel weight interop (runtime/caffemodel.py).

The reference snapshots nets as Caffe NetParameter protobufs
(dqn.cpp:582-620) and loads bare actor/critic weights via
--actor_weights/--critic_weights (dqn_main.cpp:23-24).  These tests pin
the wire-format codec (round trip, legacy blob encodings) and the CLI
surface (--evaluate with a .caffemodel actor).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner
from dqn_hfo_tpu.models.nets import actor_apply, critic_apply
from dqn_hfo_tpu.runtime import caffemodel as cm
from dqn_hfo_tpu.runtime import checkpoint as ckpt


def tree_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


class TestRoundTrip:
    def test_actor_roundtrip_and_forward(self, tmp_path):
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        path = os.path.join(str(tmp_path), "a.caffemodel")
        cm.write_actor_caffemodel(path, jax.device_get(ls.actor))
        got = cm.actor_params_from_caffemodel(path)
        tree_equal(got, ls.actor)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 59))
        np.testing.assert_allclose(
            np.asarray(actor_apply(got, x)),
            np.asarray(actor_apply(ls.actor, x)), rtol=1e-6)

    def test_critic_roundtrip(self, tmp_path):
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(2), cfg)
        path = os.path.join(str(tmp_path), "c.caffemodel")
        cm.write_critic_caffemodel(path, jax.device_get(ls.critic))
        got = cm.critic_params_from_caffemodel(path)
        tree_equal(got, ls.critic)

    def test_restore_learner_dispatch(self, tmp_path):
        """--actor_weights/--critic_weights accept .caffemodel files and
        re-clone targets from them (dqn.cpp:541-580 semantics)."""
        cfg = DDPGConfig(state_size=59, actor_tower=(32, 16),
                         critic_tower=(32, 16))
        src = init_learner(jax.random.PRNGKey(3), cfg)
        dst = init_learner(jax.random.PRNGKey(4), cfg)
        ap = os.path.join(str(tmp_path), "a.caffemodel")
        cp = os.path.join(str(tmp_path), "c.caffemodel")
        cm.write_actor_caffemodel(ap, jax.device_get(src.actor))
        cm.write_critic_caffemodel(cp, jax.device_get(src.critic))
        restored = ckpt.restore_learner(dst, actor_weights=ap,
                                        critic_weights=cp)
        tree_equal(restored.actor, src.actor)
        tree_equal(restored.critic, src.critic)
        tree_equal(restored.actor_target, src.actor)   # recloned


class TestWireFormatCompat:
    def test_legacy_blob_dims_and_unpacked_floats(self, tmp_path):
        """Old caffe writes blob shape as num/channels/height/width ints
        and may emit data as unpacked fixed32 entries."""
        out = bytearray()
        blob = bytearray()
        # legacy dims: num=1 channels=1 height=2 width=3
        for field, v in ((1, 1), (2, 1), (3, 2), (4, 3)):
            cm._write_tag(blob, field, 0)
            cm._write_varint(blob, v)
        import struct
        for v in (1.0, 2.0, 3.0, 4.0, 5.0, 6.0):   # unpacked floats
            cm._write_tag(blob, 5, 5)
            blob += struct.pack("<f", v)
        layer = bytearray()
        cm._write_len_delimited(layer, 1, b"ip1_layer")
        cm._write_len_delimited(layer, 2, b"InnerProduct")
        cm._write_len_delimited(layer, 7, bytes(blob))
        # bias blob, modern encoding
        bias = np.zeros(2, np.float32)
        cm._write_len_delimited(layer, 7, cm._serialize_blob(bias))
        cm._write_len_delimited(out, 1, b"Actor")
        cm._write_len_delimited(out, 100, bytes(layer))
        path = os.path.join(str(tmp_path), "legacy.caffemodel")
        open(path, "wb").write(bytes(out))

        net = cm.read_netparameter(path)
        assert net["name"] == "Actor"
        (l,) = net["layers"]
        assert l["name"] == "ip1_layer"
        np.testing.assert_array_equal(
            l["blobs"][0], np.asarray([[1, 2, 3], [4, 5, 6]], np.float32))

    def test_v1_legacy_layers_field(self, tmp_path):
        """NetParameter.layers (field 2, V1LayerParameter: name=4,
        blobs=6) from pre-2014 caffe parses too."""
        blob = cm._serialize_blob(np.asarray([[1.0, 2.0]], np.float32))
        layer = bytearray()
        cm._write_len_delimited(layer, 4, b"ip1_layer")
        cm._write_tag(layer, 5, 0)
        cm._write_varint(layer, 14)      # V1 enum INNER_PRODUCT
        cm._write_len_delimited(layer, 6, blob)
        out = bytearray()
        cm._write_len_delimited(out, 2, bytes(layer))
        path = os.path.join(str(tmp_path), "v1.caffemodel")
        open(path, "wb").write(bytes(out))
        net = cm.read_netparameter(path)
        (l,) = net["layers"]
        assert l["name"] == "ip1_layer" and l["type"] == 14
        np.testing.assert_array_equal(l["blobs"][0],
                                      [[1.0, 2.0]])


class TestCLIEvaluate:
    def test_evaluate_with_caffemodel_actor(self, tmp_path):
        """The ultimate cross-validation path: a reference-format actor
        evaluated in-engine through the CLI (dqn_main.cpp:313-340)."""
        from dqn_hfo_tpu.runtime.config import RunConfig
        from dqn_hfo_tpu.runtime.loop import run
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(7), cfg)
        ap = os.path.join(str(tmp_path), "ref_actor.caffemodel")
        cm.write_actor_caffemodel(ap, jax.device_get(ls.actor))
        em = run(RunConfig(evaluate=True, actor_weights=ap, repeat_games=4,
                           frames_per_trial=24, untouched_time=16,
                           seed=9))
        assert 0.0 <= em["goal_perc"] <= 1.0
        assert np.isfinite(em["avg_reward"])
