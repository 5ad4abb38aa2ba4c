"""A1/A5 (SURVEY §5): structured JSON-lines logging + per-stage timers.

The pipeline's observability channel — StudyRunner/cli emit every stage
and failure event through these; the contracts pinned here are what a
dashboard/CI consumer parses (`--log`/`TDA_TPU_LOG` JSON lines)."""
import io
import json

from tda_eeg_audio_tpu.utils.logging import StructuredLogger, configure
from tda_eeg_audio_tpu.utils import logging as tlog
from tda_eeg_audio_tpu.utils.profiling import StageTimes, device_trace


def test_event_json_lines_schema(tmp_path):
    buf = io.StringIO()
    path = tmp_path / "ev.jsonl"
    log = StructuredLogger(buf, str(path), run="r1")
    log.event("zero_window_skipped", file="a.mat")
    log.bind(shard=3).event("merge", n=7)
    stream_lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    file_lines = [json.loads(x) for x in path.read_text().splitlines()]
    assert stream_lines == file_lines                 # both sinks, same record
    assert stream_lines[0]["event"] == "zero_window_skipped"
    assert stream_lines[0]["file"] == "a.mat"
    assert stream_lines[0]["run"] == "r1"             # bound context sticks
    assert stream_lines[1]["shard"] == 3 and stream_lines[1]["run"] == "r1"
    assert all("ts" in r for r in stream_lines)


def test_stage_event_rate_math():
    buf = io.StringIO()
    StructuredLogger(buf).stage("features", 2.0, items=500, K=10)
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "stage" and rec["stage"] == "features"
    assert rec["seconds"] == 2.0 and rec["items"] == 500
    assert rec["items_per_sec"] == 250.0 and rec["K"] == 10


def test_configure_rebinds_global(tmp_path, monkeypatch):
    path = tmp_path / "sub" / "log.jsonl"      # parent dir auto-created
    old = tlog.LOGGER
    try:
        configure(str(path))
        tlog.LOGGER.event("probe", x=1)
        assert json.loads(path.read_text())["x"] == 1
    finally:
        tlog.LOGGER = old


def test_stage_times_accumulate_and_dump(tmp_path):
    st = StageTimes()
    with st.stage("tda", items=100):
        pass
    with st.stage("tda", items=50):
        pass
    rep = st.report()
    assert rep["tda"]["items"] == 150
    assert rep["tda"]["seconds"] >= 0
    assert rep["tda"]["items_per_sec"] > 0
    p = tmp_path / "times.json"
    st.dump(p)
    assert json.loads(p.read_text()) == rep


def test_device_trace_noop_without_dir():
    with device_trace(None):                   # must not require a device
        x = 1 + 1
    assert x == 2
