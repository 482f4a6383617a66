"""resolve_checkpoint (streaming/jobs.py): the shared checkpoint
policy every stream twin routes through — deterministic default
location, and state/lineage reconciliation in both mismatch
directions. The end-to-end behaviors are exercised by the PH twin's
resume/rebuild/replay tests; this pins the decision table itself."""

from __future__ import annotations

import os
import tempfile

from datanika_core_spark.streaming.jobs import resolve_checkpoint


def _mk_commits(loc):
    os.makedirs(os.path.join(loc, "commits"), exist_ok=True)
    with open(os.path.join(loc, "commits", "0"), "w") as f:
        f.write("{}")


def test_default_location_is_deterministic_and_namespaced(spark):
    import getpass

    a = resolve_checkpoint(spark, None, "kindx", "tbl_a")
    b = resolve_checkpoint(spark, None, "kindx", "tbl_a")
    assert a == b
    assert a.endswith(os.path.join("kindx", "tbl_a"))
    # namespaced per user + warehouse: concurrent sessions with a
    # different warehouse (or another user) never share a lineage
    assert f"datanika_ck_{getpass.getuser()}_" in a
    assert resolve_checkpoint(spark, None, "kindx", "tbl_b") != a


def test_explicit_dir_keys_by_state_name(spark, tmp_path):
    loc = resolve_checkpoint(spark, str(tmp_path), "k", "tbl")
    assert loc == os.path.join(str(tmp_path), "tbl")


def test_state_without_commits_triggers_reset(spark, tmp_path):
    calls = []
    loc = resolve_checkpoint(
        spark, str(tmp_path), "k", "tbl",
        has_state=lambda: True,
        reset_state=lambda: calls.append("reset"),
    )
    assert calls == ["reset"]
    assert os.path.join(str(tmp_path), "tbl") == loc


def test_state_with_commits_resumes_untouched(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "tbl")
    _mk_commits(loc)
    calls = []
    resolve_checkpoint(
        spark, str(tmp_path), "k", "tbl",
        has_state=lambda: True,
        reset_state=lambda: calls.append("reset"),
    )
    assert calls == []
    assert os.path.isdir(os.path.join(loc, "commits"))


def test_commits_without_state_clears_checkpoint_and_resets(
    spark, tmp_path
):
    """Both the checkpoint AND any auxiliary state remnants must go:
    a multi-table monitor whose probe only sees the primary table
    (DQ counters + keys) would otherwise replay against the stale
    secondary table and corrupt the rebuilt counters."""
    loc = os.path.join(str(tmp_path), "tbl")
    _mk_commits(loc)
    calls = []
    resolve_checkpoint(
        spark, str(tmp_path), "k", "tbl",
        has_state=lambda: False,
        reset_state=lambda: calls.append("reset"),
    )
    assert calls == ["reset"]
    assert not os.path.exists(loc)


def test_idempotent_store_skips_reset_but_still_replays(spark, tmp_path):
    """reset_state=None (HLL / left-anti-keyed stores): existing
    state + fresh checkpoint is left alone — replay re-absorbs
    idempotently — while the dropped-state direction still clears."""
    loc = os.path.join(str(tmp_path), "tbl")
    resolve_checkpoint(
        spark, str(tmp_path), "k", "tbl", has_state=lambda: True
    )
    _mk_commits(loc)
    resolve_checkpoint(
        spark, str(tmp_path), "k", "tbl", has_state=lambda: False
    )
    assert not os.path.exists(loc)


def test_no_probe_means_no_reconciliation(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "tbl")
    _mk_commits(loc)
    resolve_checkpoint(spark, str(tmp_path), "k", "tbl")
    assert os.path.isdir(os.path.join(loc, "commits"))


def test_tempdir_default_respects_env(spark):
    assert resolve_checkpoint(spark, None, "k", "t").startswith(
        tempfile.gettempdir()
    )
