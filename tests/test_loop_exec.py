"""loop_exec must be reentrant and thread-safe (r12 advice #1):
overlapping fixpoint loops — nested, or on concurrent threads — may
not corrupt the session conf on exit (the old save/restore could
leave AQE permanently off and shuffle.partitions sized for the OTHER
loop's graph)."""

import threading
import time

from database_spark.operators import lifecycle as L


def _conf(spark):
    return (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )


def test_loop_exec_nested_restores_outer_conf(spark):
    before = _conf(spark)
    with L.loop_exec(spark, 6):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        with L.loop_exec(spark, 12):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "12"
        # inner exit must NOT restore yet (outer loop still running)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert _conf(spark) == before


def test_loop_exec_concurrent_threads_restore_once(spark):
    before = _conf(spark)
    release = threading.Event()
    entered = threading.Event()

    def long_loop():
        with L.loop_exec(spark, 4):
            entered.set()
            release.wait(10)

    t = threading.Thread(target=long_loop)
    t.start()
    assert entered.wait(10)
    # a second loop enters and exits while the first is still running:
    # its exit must not restore (the first loop still needs the
    # profile), and the FINAL exit must restore the true pre-loop conf
    with L.loop_exec(spark, 16):
        pass
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    release.set()
    t.join(10)
    deadline = time.time() + 5
    while _conf(spark) != before and time.time() < deadline:
        time.sleep(0.05)
    assert _conf(spark) == before
