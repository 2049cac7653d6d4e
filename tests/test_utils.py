"""Tests for host utilities, hot reload, debug channel, colorfilter plumbing."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from simlod_tpu.utils import debugprint, hostutils


def test_read_binary_file(tmp_path):
    p = tmp_path / "x.bin"
    data = bytes(range(256))
    p.write_bytes(data)
    whole = hostutils.read_binary_file(str(p))
    np.testing.assert_array_equal(whole, np.frombuffer(data, np.uint8))
    part = hostutils.read_binary_file(str(p), 10, 5)
    np.testing.assert_array_equal(part, np.arange(10, 15, dtype=np.uint8))
    tgt = np.zeros(20, np.uint8)
    n = hostutils.read_binary_file_into(str(p), 250, 100, tgt, 2)
    assert n == 6  # clamped at EOF
    np.testing.assert_array_equal(tgt[2:8], np.arange(250, 256, dtype=np.uint8))


def test_monitor_file(tmp_path):
    p = tmp_path / "watched.txt"
    p.write_text("a")
    hits = []
    stop = hostutils.monitor_file(str(p), lambda: hits.append(1), interval_s=0.02)
    time.sleep(0.1)
    p.write_text("bb")
    os.utime(p)
    deadline = time.time() + 2.0
    while not hits and time.time() < deadline:
        time.sleep(0.02)
    stop.set()
    assert hits


def test_event_queue():
    q = hostutils.EventQueue()
    out = []
    q.schedule(lambda: out.append("now"))
    q.schedule(lambda: out.append("later"), delay_s=10.0)
    q.process()
    assert out == ["now"]


def test_kv_channel():
    kv = debugprint.KVChannel()

    @jax.jit
    def f(x):
        kv.set("mean", jnp.mean(x))
        return x * 2, kv.values()

    y, vals = f(jnp.arange(4.0))
    host = debugprint.KVChannel.to_host(vals)
    assert host["mean"] == 1.5


def test_format_helpers():
    assert hostutils.format_number(1234567) == "1,234,567"
    assert hostutils.format_bytes(3 * 1024 * 1024).endswith("MB")
