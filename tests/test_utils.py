"""Unit tests for the runtime utilities (logging, profiling)."""

import json
import time

from deepfbsdejsolvers_tpu.utils.logging import JSONLWriter, MetricsLogger, read_jsonl
from deepfbsdejsolvers_tpu.utils.profiling import ThroughputMeter, trace_profile


def test_jsonl_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with JSONLWriter(path) as w:
        w.write({"a": 1, "b": [1, 2]})
        w.write({"a": 2.5})
    recs = read_jsonl(path)
    assert recs == [{"a": 1, "b": [1, 2]}, {"a": 2.5}]


def test_metrics_logger_tags_and_children(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path, tags={"experiment": "x"})
    logger.log(epoch=0, loss=1.0)
    child = logger.child(method="Global")
    child.log(epoch=1, loss=0.5)
    logger.close()
    recs = read_jsonl(path)
    assert recs[0]["experiment"] == "x" and "wall_s" in recs[0]
    assert recs[1]["method"] == "Global" and recs[1]["epoch"] == 1


def test_throughput_meter():
    meter = ThroughputMeter(paths_per_step=100, sde_steps=10, n_chips=2)
    meter.start()
    time.sleep(0.05)
    stats = meter.mark(n_train_steps=4)
    assert stats["elapsed_s"] >= 0.05
    assert stats["paths_steps_per_sec"] == 100 * 10 * 4 / stats["elapsed_s"]
    assert stats["paths_steps_per_sec_per_chip"] == stats["paths_steps_per_sec"] / 2


def test_trace_profile_none_is_noop():
    with trace_profile(None):
        pass  # must not start a profiler


def test_jsonable_jax_scalars(tmp_path):
    import jax.numpy as jnp

    path = str(tmp_path / "m.jsonl")
    with JSONLWriter(path) as w:
        w.write({"loss": jnp.float32(1.5), "hist": jnp.arange(3)})
    rec = read_jsonl(path)[0]
    assert rec == {"loss": 1.5, "hist": [0, 1, 2]}
