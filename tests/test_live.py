"""Live feeder semantics: latest-wins shedding, threaded producer."""

import threading
import time

import numpy as np

from loam_velodyne_tpu.io.live import LiveFeeder


class SlowDriver:
    def __init__(self, delay=0.0):
        self.delay = delay
        self.seen = []

    def process_sweep(self, pts, stamp=None):
        if self.delay:
            time.sleep(self.delay)
        self.seen.append(stamp)


def test_fifo_when_keeping_up():
    drv = SlowDriver()
    f = LiveFeeder(drv, queue_depth=2)
    for k in range(3):
        f.push(np.zeros((1, 3)), stamp=float(k))
        assert f.spin_once()
    assert drv.seen == [0.0, 1.0, 2.0]
    assert f.stats["dropped"] == 0


def test_latest_wins_shedding():
    drv = SlowDriver()
    f = LiveFeeder(drv, queue_depth=2)
    for k in range(5):          # burst of 5 with no consumption
        f.push(np.zeros((1, 3)), stamp=float(k))
    while f.spin_once():
        pass
    # queue depth 2: only the 2 newest survive
    assert drv.seen == [3.0, 4.0]
    assert f.stats == {"pushed": 5, "processed": 2, "dropped": 3,
                       "queued": 0}


def test_threaded_producer_consumer():
    drv = SlowDriver(delay=0.005)
    f = LiveFeeder(drv, queue_depth=2)

    def produce():
        for k in range(40):
            f.push(np.zeros((1, 3)), stamp=float(k))
            time.sleep(0.001)
        time.sleep(0.1)
        f.stop()

    t = threading.Thread(target=produce)
    t.start()
    f.spin(timeout=5.0)
    t.join()
    s = f.stats
    assert s["processed"] + s["dropped"] + s["queued"] == s["pushed"] == 40
    assert s["dropped"] > 0                 # producer outpaced consumer
    assert drv.seen[-1] is not None
    assert drv.seen == sorted(drv.seen)     # order preserved


def test_run_live_matches_process_sweep():
    """The pipelined live loop (depth-2, packed-only readback) must
    produce exactly the per-sweep trajectory/telemetry of the
    synchronous path — pipelining reorders host work, not math."""
    from loam_velodyne_tpu.config import LoamConfig
    from loam_velodyne_tpu.io import synthetic
    from loam_velodyne_tpu.io.driver import LoamDriver

    sweeps, _, _ = synthetic.generate_sequence(5, n_azimuth=240)
    cfg = LoamConfig.preset("VLP-16")

    a = LoamDriver(cfg, system_delay=0)
    for pts in sweeps:
        a.process_sweep(pts)

    b = LoamDriver(cfg, system_delay=0)
    lat = b.run_live(sweeps)

    assert len(lat) == len(sweeps)
    assert len(b.trajectory) == len(a.trajectory)
    np.testing.assert_allclose(np.stack(b.trajectory),
                               np.stack(a.trajectory), atol=1e-6)
    assert (b.metrics.counters.get("ingest_dropped", 0)
            == a.metrics.counters.get("ingest_dropped", 0))
