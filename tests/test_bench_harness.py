"""bench.py outage hardening (round-3 verdict weak #1): when the TPU backend
cannot initialize, the driver's record must still be one parseable JSON line
with an "error" field — data, not a traceback."""
import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def test_simulated_outage_emits_json_error_line(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "_probe_devices",
        lambda: (_ for _ in ()).throw(RuntimeError("Unable to initialize backend 'axon'")),
    )
    with pytest.raises(RuntimeError, match="backend_unavailable"):
        bench.init_backend(max_tries=2, timeout_s=5, backoffs=(0,))
    try:
        bench.init_backend(max_tries=1, timeout_s=5)
    except RuntimeError as e:
        bench.emit_error_line(e)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "pairs_matched_per_sec"
    assert rec["value"] is None
    assert "backend_unavailable" in rec["error"]
    # Explicit failure discriminator (round-4 advisor): success must never be
    # inferable from value alone, because a banked partial headline rides in
    # error records too.
    assert rec["ok"] is False and rec["partial"] is False


def test_error_record_with_banked_value_is_marked_partial(capsys):
    """A sweep that finished before a later sub-bench hang carries its
    headline number — flagged partial, never mistakable for success."""
    bench._PARTIAL.update({"stage": "bench_ba100", "value": 1234.5,
                           "vs_baseline": 9.9})
    try:
        bench.emit_error_line(RuntimeError("tunnel hang"))
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["value"] == 1234.5
        assert rec["ok"] is False and rec["partial"] is True
    finally:
        bench._PARTIAL.clear()
        bench._PARTIAL["stage"] = "start"


def test_simulated_outage_subprocess_rc0_json():
    """End-to-end: `python bench.py` under a forced outage exits 0 and its
    last stdout line parses as JSON with an error field."""
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "SFM_BENCH_FORCE_BACKEND_FAIL": "1"}
    p = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    line = p.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] is None and "backend_unavailable" in rec["error"]


def test_midprogram_hang_hits_deadline_and_emits_json():
    """Backend init can SUCCEED and a later remote compile/dispatch hang
    (observed 2026-08-20: a trivial matmul stuck >240 s after a clean
    jax.devices()). The whole-run deadline watchdog must then print one
    parseable JSON line naming the hung stage and exit 0 — the per-attempt
    init watchdog cannot reach this failure mode."""
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu",  # init succeeds instantly off-tunnel
           "SFM_BENCH_FORCE_HANG": "1",
           "SFM_BENCH_DEADLINE_S": "8"}
    p = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "deadline_exceeded" in rec["error"]
    # Under heavy CPU load the deadline can legitimately fire while the jax
    # import inside init_backend is still running — both stages prove the
    # watchdog escapes a hung main thread.
    assert rec["stage"] in ("forced_hang", "init_backend")


def test_feats_cache_key_tracks_config_and_source(tmp_path, monkeypatch):
    from sfm_tpu.config import SfMConfig, FeatureConfig
    import dataclasses

    a = bench._feats_cache_path(SfMConfig())
    b = bench._feats_cache_path(
        dataclasses.replace(SfMConfig(), features=FeatureConfig(max_keypoints=77)))
    assert a != b  # config change invalidates
    # Source change invalidates: point ROOT at a copy with one edited file.
    import shutil
    fake = tmp_path / "repo"
    (fake / "sfm_tpu").mkdir(parents=True)
    shutil.copytree(ROOT / "sfm_tpu" / "features", fake / "sfm_tpu" / "features")
    monkeypatch.setattr(bench, "ROOT", fake)
    c = bench._feats_cache_path(SfMConfig())
    assert c == a  # identical sources -> identical key
    f = sorted((fake / "sfm_tpu" / "features").glob("*.py"))[0]
    f.write_text(f.read_text() + "\n# perturbed\n")
    d = bench._feats_cache_path(SfMConfig())
    assert d != a


def test_timeout_then_success_leaves_no_nondaemon_thread(monkeypatch):
    """A hung first probe must not leave a non-daemon worker that would block
    interpreter exit after a successful retry (round-4 review finding: the
    ThreadPoolExecutor variant hung the harness on exactly this sequence)."""
    import threading

    release = threading.Event()
    calls = {"n": 0}

    def probe():
        calls["n"] += 1
        if calls["n"] == 1:
            release.wait(30)  # simulated jax.devices() hang
            return None
        return ["fake-device"]

    monkeypatch.setattr(bench, "_probe_devices", probe)
    before = set(threading.enumerate())
    devs = bench.init_backend(max_tries=2, timeout_s=1, backoffs=(0,))
    assert devs == ["fake-device"]
    leaked = [t for t in threading.enumerate() if t not in before and t.is_alive()]
    assert all(t.daemon for t in leaked), leaked
    release.set()
