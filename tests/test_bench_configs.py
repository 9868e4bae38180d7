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
    # emits exactly the four judged lines so it fits the driver budget)
    assert set(bench.CONFIG_ENV) == set(bench.AB_CONFIGS)
    assert not (set(bench.AB_CONFIGS) & set(bench.DEFAULT_CONFIGS))
    assert len(bench.DEFAULT_CONFIGS) == 4


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
