"""trace_summary must keep parsing the checked-in flagship trace artifact
(docs/perf/) and reproduce the headline occupancy/MFU numbers BASELINE.md
cites — guards both the tool and the artifact."""

import gzip
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(
    REPO, "docs", "perf", "trace_flagship_r02.xplane.pb.gz"
)


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "trace_summary", os.path.join(REPO, "tools", "trace_summary.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_flagship_trace_headline_numbers(tmp_path):
    ts = _load_tool()
    try:
        xplane_pb2 = ts._load_xplane_pb2()
    except ImportError:
        pytest.skip("no xplane proto module in this environment")
    space = xplane_pb2.XSpace()
    with gzip.open(ARTIFACT, "rb") as f:
        space.ParseFromString(f.read())
    planes = [p for p in space.planes if p.name.startswith("/device:TPU")]
    assert planes, [p.name for p in space.planes]
    s = ts.summarize_plane(planes[0], steps=5)
    # headline numbers cited in BASELINE.md (small slack for rounding)
    assert s["occupancy"] > 0.995, s["occupancy"]
    assert 0.80 <= s["mfu_vs_peak"] <= 0.84, s["mfu_vs_peak"]
    conv = s["categories"].get("convolution fusion")
    assert conv and conv["time_share"] > 0.90, s["categories"]
    assert abs(s["per_step_tflops"] - 195.75) < 2.0, s["per_step_tflops"]
    assert s["hbm_bw_util"] < 0.3, s["hbm_bw_util"]  # compute-bound
