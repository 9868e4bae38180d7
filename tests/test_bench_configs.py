"""Consistency guards for the bench config registry (no device work):
the A/B env-override names must exist, and the recovery script must only
reference real configs — catches name drift without burning chip time."""
import os
import re

import bench

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_env_keys_are_configs():
    assert set(bench.CONFIG_ENV) <= set(bench.ALL_CONFIGS)
    # A/B variants live in the default set so the plain driver run
    # measures them
    assert set(bench.CONFIG_ENV) <= set(bench.DEFAULT_CONFIGS)


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
