"""Meters + epoch-log writer: byte-compat with the reference's csv.writer
format and meter arithmetic."""

import csv
import io

import numpy as np

from cstp_tpu.train.meters import AverageMeter, Logger, calculate_accuracy


def test_average_meter_weighted_mean():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0
    assert m.count == 4
    assert abs(m.avg - 3.5) < 1e-12
    m.reset()
    assert m.avg == 0.0 and m.count == 0


def test_logger_bytes_match_reference_csv_writer(tmp_path):
    """Golden: our writer must produce byte-identical files to the
    reference's csv.writer(delimiter='\\t') (utils.py:26-48) so downstream
    log parsers work across both frameworks."""
    header = ["epoch", "loss", "loss_byol", "acc", "lr"]
    rows = [
        {"epoch": 1, "loss": 10.123456, "loss_byol": 3.9, "acc": None,
         "lr": 0.09},
        {"epoch": 2, "loss": 9.5, "loss_byol": 3.0, "acc": 0.25,
         "lr": float(f"{0.0899999:.5f}")},
    ]
    # reference-side rendering
    buf = io.StringIO()
    wtr = csv.writer(buf, delimiter="\t")
    wtr.writerow(header)
    for r in rows:
        wtr.writerow([r[c] for c in header])
    want = buf.getvalue()

    path = str(tmp_path / "train.log")
    with Logger(path, header, overlay=True) as lg:
        for r in rows:
            lg.log(r)
    with open(path, newline="") as f:
        assert f.read() == want

    # append (resume) mode: no header, rows accumulate
    with Logger(path, header, overlay=False) as lg:
        lg.log(rows[0])
    with open(path, newline="") as f:
        got = f.read()
    assert got.startswith(want) and got.count("\r\n") == 4

    # missing column is a loud error (reference asserts, utils.py:45)
    lg = Logger(path, header, overlay=True)
    try:
        import pytest

        with pytest.raises(KeyError):
            lg.log({"epoch": 1})
    finally:
        lg.close()


def test_calculate_accuracy():
    logits = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7], [0.6, 0.4]])
    assert calculate_accuracy(logits, [1, 0, 0, 0]) == 0.75
