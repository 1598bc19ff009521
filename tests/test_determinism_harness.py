"""determinism_check.py harness units: the layout audit is only as
good as (a) its hash being insensitive to ROW ORDER (so a reshuffled
but equal result matches) while sensitive to VALUES, and (b) every
config key it flips actually being runtime-settable (a key Spark
silently ignores would turn config B into config A and the audit into
a tautology)."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import determinism_check as dc  # noqa: E402


def test_value_hash_is_row_order_insensitive():
    a = pd.DataFrame({"k": [1, 2, 3], "v": [0.1, 0.2, 0.3]})
    b = a.iloc[[2, 0, 1]].reset_index(drop=True)
    assert dc._value_hash(a) == dc._value_hash(b)


def test_value_hash_is_column_order_insensitive():
    a = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    b = a[["v", "k"]]
    assert dc._value_hash(a) == dc._value_hash(b)


def test_value_hash_sees_value_changes():
    a = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    b = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.000001]})
    ra, ha = dc._value_hash(a)
    rb, hb = dc._value_hash(b)
    assert ra == rb == 2
    assert ha != hb


def test_value_hash_rounds_fp_like_the_oracle_compare():
    # drift below the oracle compare's 9-decimal rounding must NOT
    # flag — otherwise every double-summing query would mismatch on
    # benign cross-layout ulp noise the driver compare also tolerates
    a = pd.DataFrame({"v": [0.1 + 0.2]})
    b = pd.DataFrame({"v": [0.3 + 1e-12]})
    assert dc._value_hash(a) == dc._value_hash(b)


def test_config_axes_differ_on_every_key():
    assert set(dc._CONF_A) == set(dc._CONF_B)
    for k in dc._CONF_A:
        assert dc._CONF_A[k] != dc._CONF_B[k], k


def test_config_a_matches_the_deployed_session(spark):
    # config A claims to be "driver-like"; its broadcast threshold and
    # AQE setting must track what the session factory actually deploys
    # (a 10 MiB-vs-64 MiB drift here left the broadcast-vs-shuffle
    # determinism axis unexercised at the deployed layout — caught in
    # the round-12 self-review)
    assert dc._CONF_A["spark.sql.autoBroadcastJoinThreshold"] == spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold"
    )
    assert dc._CONF_A["spark.sql.adaptive.enabled"] == spark.conf.get(
        "spark.sql.adaptive.enabled"
    )


def test_all_conf_keys_are_runtime_settable(spark):
    # spark.conf.set raises AnalysisException on a static conf — every
    # audit key must accept a runtime set AND read back the new value,
    # on both the A and B sides.
    #
    # Restore discipline: capture every key's EFFECTIVE value up
    # front and restore it unconditionally in a finally. The first
    # version restored per-key only when get(k, None) was non-None —
    # but for keys the session never set explicitly that returns
    # None, the restore was skipped, and the NEXT loop's "old" was
    # the adversarial B value, so the shared session ended with
    # exchange.reuse=false and 1 MiB file splits: two unrelated plan
    # tests (ReuseExchange rule, DPP's reuse-based subquery
    # broadcast) failed suite-wide while passing solo.
    originals = {}
    for k in dc._CONF_A:
        try:
            originals[k] = spark.conf.get(k)  # effective value
        except Exception:  # noqa: BLE001 — defined-default-less key
            originals[k] = None
    try:
        for conf in (dc._CONF_B, dc._CONF_A):
            for k, v in conf.items():
                spark.conf.set(k, v)
                assert spark.conf.get(k) == v, k
    finally:
        for k, v in originals.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
