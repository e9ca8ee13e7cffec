"""Video IO + video predict pipeline tests (ref media/video.py, media/stream.py)."""

import os

import numpy as np
import pytest

from super_gradients_tpu.inference.video import (
    check_is_gif,
    includes_video_extension,
    lazy_load_video,
    load_video,
    save_gif,
    save_video,
)


def _frames(n=8, h=48, w=64):
    rng = np.random.RandomState(0)
    return [rng.randint(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_extension_helpers():
    assert includes_video_extension("a.mp4") and includes_video_extension("A.GIF")
    assert not includes_video_extension("a.jpg") and not includes_video_extension(123)
    assert check_is_gif("x.gif") and not check_is_gif("x.mp4")


def test_mp4_roundtrip(tmp_path):
    path = str(tmp_path / "clip.mp4")
    frames = _frames()
    save_video(path, frames, fps=10)
    loaded, fps = load_video(path)
    assert fps == 10 and len(loaded) == len(frames)
    assert loaded[0].shape == frames[0].shape
    # mp4 is lossy; just require correlation with the source
    a, b = loaded[0].astype(np.float32).ravel(), frames[0].astype(np.float32).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.5


def test_lazy_load_respects_max_frames(tmp_path):
    path = str(tmp_path / "clip.mp4")
    save_video(path, _frames(10), fps=5)
    it, fps, total = lazy_load_video(path, max_frames=3)
    assert total == 3
    assert len(list(it)) == 3


def test_gif_roundtrip(tmp_path):
    path = str(tmp_path / "clip.gif")
    save_gif(path, _frames(4), fps=5)
    loaded, _fps = load_video(path)
    assert len(loaded) >= 4 - 1  # gif readers may merge duplicate frames


def test_save_video_rejects_bad_extension(tmp_path):
    with pytest.raises(ValueError, match="output_path"):
        save_video(str(tmp_path / "clip.txt"), _frames(2), fps=5)


def test_save_mp4_rejects_mixed_sizes(tmp_path):
    frames = [_frames(1)[0], np.zeros((32, 32, 3), np.uint8)]
    with pytest.raises(RuntimeError, match="frame size"):
        save_video(str(tmp_path / "c.mp4"), frames, fps=5)


def test_fps_counter_and_stream_headless():
    from super_gradients_tpu.inference.stream import FPSCounter, WebcamStreaming

    c = FPSCounter()
    for _ in range(3):
        fps = c.tick()
    assert fps > 0
    ws = WebcamStreaming(frame_processing_fn=lambda f: f, capture=999)
    with pytest.raises(ValueError, match="capture device"):
        ws.run()  # bogus device id fails loudly, headless-safe


def test_video_predictions_save(tmp_path):
    """VideoPredictions renders drawn frames back to disk at source fps."""
    from super_gradients_tpu.inference.prediction_results import DetectionPrediction, VideoPredictions

    frames = _frames(4)
    preds = [
        DetectionPrediction(
            bboxes_xyxy=np.asarray([[4.0, 4.0, 20.0, 20.0]]),
            confidence=np.asarray([0.9]),
            labels=np.asarray([0]),
            class_names=["thing"],
            image=f,
        )
        for f in frames
    ]
    vp = VideoPredictions(preds, fps=5)
    out = str(tmp_path / "annotated.mp4")
    vp.save(out)
    loaded, fps = load_video(out)
    assert fps == 5 and len(loaded) == 4
