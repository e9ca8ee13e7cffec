"""Webcam streaming loop (reference ``training/utils/media/stream.py``).

``WebcamStreaming`` grabs frames from a cv2 capture device, runs
``frame_processing_fn`` (typically a single-image predict+draw), overlays the
measured FPS, and displays until ``q`` is pressed. Headless environments (no
display) raise at ``run()`` time, not import time.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np


class FPSCounter:
    """EMA-free windowed FPS (ref stream.py:105-128)."""

    def __init__(self, update_frequency: Optional[float] = None):
        self._update_frequency = update_frequency
        self._start_time = time.time()
        self._frame_count = 0
        self._fps = 0.0

    def tick(self) -> float:
        self._frame_count += 1
        elapsed = time.time() - self._start_time
        if self._update_frequency is None or elapsed >= self._update_frequency:
            if elapsed > 0:
                self._fps = self._frame_count / elapsed
            self._start_time = time.time()
            self._frame_count = 0
        return self._fps

    @property
    def fps(self) -> float:
        return self._fps


def write_fps_to_frame(frame: np.ndarray, fps: float) -> np.ndarray:
    """ref stream.py:92-102."""
    import cv2

    cv2.putText(frame, f"FPS: {fps:.1f}", (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
    return frame


class WebcamStreaming:
    """ref stream.py:14-89."""

    def __init__(
        self,
        window_name: str = "",
        frame_processing_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        capture: int = 0,
        fps_update_frequency: Optional[float] = None,
    ):
        self.window_name = window_name
        self.frame_processing_fn = frame_processing_fn
        self._capture_id = capture
        self._cap = None
        self._fps_counter = FPSCounter(update_frequency=fps_update_frequency)

    @property
    def fps(self) -> float:
        return self._fps_counter.fps

    def run(self) -> None:
        import cv2

        self._cap = cv2.VideoCapture(self._capture_id)
        if not self._cap.isOpened():
            raise ValueError(f"cannot open capture device {self._capture_id}")
        try:
            while self._display_single_frame():
                pass
        finally:
            self._stop()

    def _display_single_frame(self) -> bool:
        import cv2

        ok, frame = self._cap.read()
        if not ok:
            return False
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if self.frame_processing_fn is not None:
            frame = self.frame_processing_fn(frame)
        frame = np.ascontiguousarray(frame, np.uint8)
        write_fps_to_frame(frame, self._fps_counter.tick())
        cv2.imshow(self.window_name, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        return (cv2.waitKey(1) & 0xFF) != ord("q")

    def _stop(self) -> None:
        import cv2

        if self._cap is not None:
            self._cap.release()
        try:
            cv2.destroyAllWindows()
        except cv2.error:
            pass  # headless

    def __del__(self):
        if self._cap is not None:
            self._cap.release()
