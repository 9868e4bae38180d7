"""Consistency guards for the bench config registry (no device work):
the A/B env-override names must exist, and the recovery script must only
reference real configs — catches name drift without burning chip time."""
import os
import re

import bench

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_env_keys_are_configs():
    assert set(bench.CONFIG_ENV) <= set(bench.ALL_CONFIGS)
    # A/B variants live behind --all (the r4 slim: the plain driver run
    # emits exactly the four judged lines so it fits the driver budget);
    # headline-bf16 needs no env override (runtime build_model dtype) so
    # the group worker can emit it in-process as the bonus fifth line
    assert set(bench.CONFIG_ENV) == set(bench.AB_CONFIGS) - {"headline-bf16"}
    assert not (set(bench.AB_CONFIGS) & set(bench.DEFAULT_CONFIGS))
    assert len(bench.DEFAULT_CONFIGS) == 4
    assert set(bench.GROUP_CONFIGS) == set(bench.DEFAULT_CONFIGS) | {
        "headline-bf16"}


def test_metric_of_covers_every_config():
    # the orchestrator detects which lines landed by exact metric-string
    # match against streamed worker stdout — every config needs one, and
    # no metric string may be a substring of another (a prefix match
    # would mark the wrong config as done)
    assert set(bench.METRIC_OF) == set(bench.ALL_CONFIGS)
    metrics = list(bench.METRIC_OF.values())
    for i, a in enumerate(metrics):
        for j, b in enumerate(metrics):
            if i != j:
                assert a not in b, (a, b)


def test_stream_worker_forwards_lines_live_and_terminates(capfd):
    import sys as _sys

    # clean exit returns the real rc with all lines (run FIRST: this also
    # warms interpreter startup so the SIGTERM case's cap measures the
    # worker, not a cold python launch on a loaded 1-CPU container)
    rc, lines = bench._stream_worker(
        [_sys.executable, "-c", "print('ok',flush=True)"], timeout=60.0)
    assert rc == 0 and [ln.strip() for ln in lines] == ["ok"]

    # worker prints two lines then sleeps past the cap: both lines must
    # be forwarded and the worker must be SIGTERMed (rc None).  The cap
    # must comfortably exceed worst-case startup latency under suite
    # load (3 s flaked once) while the sleep keeps the worker alive far
    # past it.
    code = ("import sys,time;print('L1',flush=True);print('L2',flush=True);"
            "time.sleep(300)")
    rc, lines = bench._stream_worker([_sys.executable, "-c", code],
                                     timeout=10.0)
    assert rc is None
    assert [ln.strip() for ln in lines] == ["L1", "L2"]
    assert "L1\nL2" in capfd.readouterr().out


def test_config_env_flags_exist_in_source():
    src = ""
    pkg = os.path.join(_REPO, "adyolo_tpu")
    for root, _, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                src += open(os.path.join(root, f)).read()
    for env in bench.CONFIG_ENV.values():
        for var in env:
            assert var in src, f"{var} not read anywhere in adyolo_tpu/"


def test_recovery_script_references_real_configs():
    sh = open(os.path.join(_REPO, "scripts", "tpu_recovery_run.sh")).read()
    for name in re.findall(r"--config ([\w-]+)", sh):
        assert name in bench.ALL_CONFIGS, name
