"""Pretrained checkpoint registry tests (ref pretrained_models.py)."""

import os

import pytest

from super_gradients_tpu.models.pretrained_models import (
    MODEL_URLS,
    get_pretrained_url,
    resolve_pretrained_path,
)


def test_url_table_inventory():
    assert len(MODEL_URLS) >= 50
    assert get_pretrained_url("resnet18", "imagenet").startswith("https://")
    assert get_pretrained_url("yolo_nas_s", "coco") is not None
    assert get_pretrained_url("resnet18", "nope") is None


def test_resolve_unknown_tag_lists_known():
    with pytest.raises(ValueError, match="imagenet"):
        resolve_pretrained_path("resnet18", "cifar42")


def test_resolve_missing_file_names_url_and_mirror(tmp_path, monkeypatch):
    monkeypatch.setenv("SG_PRETRAINED_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="https://"):
        resolve_pretrained_path("resnet18", "imagenet")


def test_resolve_finds_local_mirror(tmp_path, monkeypatch):
    monkeypatch.setenv("SG_PRETRAINED_DIR", str(tmp_path))
    url = get_pretrained_url("resnet18", "imagenet")
    target = tmp_path / os.path.basename(url)
    target.write_bytes(b"stub")
    assert resolve_pretrained_path("resnet18", "imagenet") == str(target)
