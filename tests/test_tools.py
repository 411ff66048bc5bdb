"""Leaderboard generator + plot-tool parser tests (the reference's only
machine-checkable invariant, tools/gen_leaderboard.py --check)."""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import gen_leaderboard as gl  # noqa: E402
from plot_lr import parse_training_log  # noqa: E402
from plot_lr_search import parse_training_logs  # noqa: E402

CSV_TEXT = """family,method,arch,pretrain,eval,image_size,lp,lp_gap,ep
MIM,MAE,ViT-B/16,IN-1K,IN-1K,224,67.7,no,75.6
VLM,SigLIP,ViT-L/16,WebLI,IN-1K,256,84.1,yes,86.1
VLM,SigLIP2,SO400M/14,WebLI,IN-1K,224,-,yes,87.68
"""


def test_load_rows_and_render(tmp_path, monkeypatch):
    csv_path = tmp_path / "results.csv"
    csv_path.write_text(CSV_TEXT)
    rows = gl.load_rows(csv_path)
    assert len(rows) == 3
    block = gl.render(rows)
    # ranked by EP descending
    lines = [l for l in block.splitlines() if l.startswith("| 1 ")]
    assert "87.68" in lines[0]
    # GAP marker and missing-LP dash
    assert gl.MARK in block
    assert "&mdash;" in block


def test_schema_validation_rejects_bad_family(tmp_path):
    bad = CSV_TEXT.replace("MIM", "XXX")
    p = tmp_path / "results.csv"
    p.write_text(bad)
    with pytest.raises(SystemExit):
        gl.load_rows(p)


def test_splice_roundtrip():
    readme = f"# head\n{gl.START}\nold\n{gl.END}\ntail"
    out = gl.splice(readme, "NEW")
    assert "NEW" in out and "old" not in out
    assert out.startswith("# head") and out.endswith("tail")


def test_scale_of():
    assert gl.scale_of("ViT-S/16") == "Small"
    assert gl.scale_of("ViT-L/14") == "Large"
    assert gl.scale_of("SO400M/14") == "Large"
    assert gl.scale_of("RN-50") == "Other"


@pytest.mark.skipif(not Path("/root/reference/results.csv").exists(),
                    reason="reference checkout not present")
def test_render_byte_equal_to_reference_readme():
    """Rendering the reference's own 21-row results.csv reproduces its
    README leaderboard block byte-for-byte."""
    rows = gl.load_rows(Path("/root/reference/results.csv"))
    block = gl.render(rows)
    ref = Path("/root/reference/README.md").read_text()
    ref_block = ref.split(gl.START, 1)[1].split(gl.END, 1)[0].strip("\n")
    assert block == ref_block


def test_plot_lr_parses_training_log(tmp_path):
    log = tmp_path / "training_log.txt"
    log.write_text(
        "Training Log\nBase learning rate: 0.1\n"
        "Epoch, Train Loss, Train Acc1, Val Loss, Val Acc1, Val Acc5\n"
        "0, 4.6973, 1.37, 4.5158, 3.01, 11.50\n"
        "1, 3.2000, 10.00, 3.1000, 12.34, 30.00\n"
        "\nFinal Results:\nMax Accuracy: 12.34%\n")
    epochs, acc = parse_training_log(str(log))
    assert epochs == [0, 1]
    assert acc == [3.01, 12.34]


def test_plot_lr_search_collects_trials(tmp_path):
    for n, (blr, acc) in enumerate([(0.1, 50.0), (0.5, 60.5)]):
        d = tmp_path / f"trial_{n}"
        d.mkdir()
        (d / "training_log.txt").write_text(
            f"Base learning rate: {blr}\nMax Accuracy: {acc}%\n")
    data = parse_training_logs(str(tmp_path))
    assert data[0.1] == [50.0]
    assert data[0.5] == [60.5]
