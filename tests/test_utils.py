import numpy as np

from slowfast_vos_tpu.utils.smoothing import ProgressLogger, SmoothedValue


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.median == 3.0  # window [2,3,4]
    assert np.isclose(v.avg, 3.0)
    assert np.isclose(v.global_avg, 2.5)
    assert v.max == 4.0
    assert v.value == 4.0
    assert "3.0" in str(v)


def test_smoothed_value_sync_single_host_noop():
    v = SmoothedValue()
    v.update(5.0)
    v.synchronize_between_processes()
    assert v.global_avg == 5.0


def test_progress_logger(capsys):
    log = ProgressLogger()
    for i in log.log_every(range(5), print_freq=2, header="test"):
        log.update(loss=float(i))
    out = capsys.readouterr().out
    assert "test [0/5]" in out and "Total time" in out
    assert log.meters["loss"].count == 5


def test_metrics_logger_tensorboard_sink(tmp_path):
    """tensorboard=True mirrors scalars to event files (reference
    SummaryWriter parity, code/train.py:82)."""
    import glob

    from slowfast_vos_tpu.utils.metrics import MetricsLogger

    lg = MetricsLogger(str(tmp_path), "tbtest", tensorboard=True)
    lg.scalar("train/batch_loss", 1.5, 0)
    lg.scalars({"jf": 0.5, "time": 2.0}, 1, prefix="eval/")
    lg.close()
    events = glob.glob(str(tmp_path / "tb-tbtest-*" / "events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    jsonl = glob.glob(str(tmp_path / "tbtest-*.jsonl"))
    assert jsonl and len(open(jsonl[0]).readlines()) == 3
