"""W&B / ClearML sinks: functional with the lib present (mocked), graceful offline."""

import sys
import types

import numpy as np
import pytest

from super_gradients_tpu.common.sg_loggers import get_sg_logger


def test_wandb_logger_records_scalars_with_mocked_wandb(tmp_path, monkeypatch):
    calls = {"init": [], "log": [], "finish": 0}

    mock = types.ModuleType("wandb")
    mock.run = types.SimpleNamespace(config=types.SimpleNamespace(update=lambda *a, **k: None))
    mock.init = lambda **kw: calls["init"].append(kw)
    mock.log = lambda data, step=None: calls["log"].append((data, step))

    def finish():
        calls["finish"] += 1

    mock.finish = finish
    monkeypatch.setitem(sys.modules, "wandb", mock)

    lg = get_sg_logger("wandb_sg_logger", experiment_name="exp", log_dir=str(tmp_path))
    lg.add_scalar("train/loss", 0.5, 3)
    lg.add_scalar("valid/Accuracy", 0.9, 3)
    lg.close()

    assert len(calls["init"]) == 1
    assert ({"train/loss": 0.5}, 3) in calls["log"]
    assert ({"valid/Accuracy": 0.9}, 3) in calls["log"]
    assert calls["finish"] == 1


def test_wandb_logger_falls_back_offline(tmp_path, monkeypatch):
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    # an import error inside init must degrade to local sinks, not raise
    lg = get_sg_logger("wandb_sg_logger", experiment_name="exp", log_dir=str(tmp_path))
    lg.add_scalar("train/loss", 1.0, 0)
    lg.close()


def test_clearml_logger_records_with_mocked_clearml(tmp_path, monkeypatch):
    reported = []

    class _Logger:
        def report_scalar(self, title, series, value, iteration):
            reported.append((title, series, value, iteration))

    class _Task:
        @staticmethod
        def init(**kw):
            return _Task()

        def get_logger(self):
            return _Logger()

        def close(self):
            pass

    mock = types.ModuleType("clearml")
    mock.Task = _Task
    monkeypatch.setitem(sys.modules, "clearml", mock)

    lg = get_sg_logger("clearml_sg_logger", experiment_name="exp", log_dir=str(tmp_path))
    lg.add_scalar("train/loss", 0.25, 7)
    lg.close()
    assert ("train", "loss", 0.25, 7) in reported


def test_dagshub_logger_records_with_mocked_mlflow(tmp_path, monkeypatch):
    calls = {"uri": [], "start": [], "metric": [], "end": 0}

    mock = types.ModuleType("mlflow")
    mock.set_tracking_uri = lambda uri: calls["uri"].append(uri)
    mock.start_run = lambda **kw: calls["start"].append(kw)
    mock.log_metric = lambda key, value, step=None: calls["metric"].append((key, value, step))
    mock.log_params = lambda params: None

    def end_run():
        calls["end"] += 1

    mock.end_run = end_run
    monkeypatch.setitem(sys.modules, "mlflow", mock)
    monkeypatch.delitem(sys.modules, "dagshub", raising=False)

    lg = get_sg_logger("dagshub_sg_logger", dagshub_repository="owner/repo",
                       experiment_name="exp", log_dir=str(tmp_path))
    lg.add_scalar("train/loss", 0.5, 3)
    lg.close()

    assert calls["uri"] == ["https://dagshub.com/owner/repo.mlflow"]
    assert len(calls["start"]) == 1
    # mlflow forbids '/' in metric keys — sanitized like the reference
    assert ("train_loss", 0.5, 3) in calls["metric"]
    assert calls["end"] == 1


def test_dagshub_logger_rejects_bad_repo_string():
    from super_gradients_tpu.common.sg_loggers import DagsHubSGLogger

    with pytest.raises(ValueError):
        DagsHubSGLogger._split_repo("not-a-repo-path")


def test_dagshub_and_deci_loggers_fall_back_offline(tmp_path, monkeypatch):
    monkeypatch.delitem(sys.modules, "mlflow", raising=False)
    monkeypatch.delitem(sys.modules, "deci_platform_client", raising=False)
    for name in ("dagshub_sg_logger", "deci_platform_sg_logger"):
        lg = get_sg_logger(name, experiment_name="exp", log_dir=str(tmp_path))
        lg.add_scalar("train/loss", 1.0, 0)
        lg.close()
