"""Video IO utilities (reference ``training/utils/media/video.py``).

cv2-backed load/save with a PIL/imageio GIF path. Frames are RGB uint8 HWC
throughout (cv2's BGR is converted at the boundary, like the reference).
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".gif")


def includes_video_extension(file_path: str) -> bool:
    """ref video.py:218."""
    return isinstance(file_path, str) and file_path.lower().endswith(VIDEO_EXTENSIONS)


def check_is_gif(file_path: str) -> bool:
    return isinstance(file_path, str) and file_path.lower().endswith(".gif")


def _open_video(file_path: str):
    """ref video.py:50 — raises on unreadable files instead of silently looping."""
    import cv2

    cap = cv2.VideoCapture(file_path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video file: {file_path}")
    return cap


def load_video(file_path: str, max_frames: Optional[int] = None) -> Tuple[List[np.ndarray], int]:
    """All frames (RGB uint8) + rounded FPS (ref video.py:17-30)."""
    frames, fps, _ = lazy_load_video(file_path, max_frames)
    return list(frames), fps


def lazy_load_video(file_path: str, max_frames: Optional[int] = None) -> Tuple[Iterator[np.ndarray], int, int]:
    """Frame iterator + fps + frame count, without materializing the video
    (ref video.py:33-47). Count is cv2's header value (may be approximate)."""
    import cv2

    cap = _open_video(file_path)
    fps = int(round(cap.get(cv2.CAP_PROP_FPS) or 25))
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if max_frames is not None:
        total = min(total, max_frames)

    def gen():
        n = 0
        while max_frames is None or n < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            n += 1
        cap.release()

    return gen(), fps, total


def save_video(output_path: str, frames: Iterable[np.ndarray], fps: int) -> None:
    """Dispatch mp4/avi vs gif by extension (ref video.py:102-116)."""
    if not includes_video_extension(output_path):
        raise ValueError(f"output_path must end with one of {VIDEO_EXTENSIONS}, got {output_path}")
    if check_is_gif(output_path):
        save_gif(output_path, frames, fps)
    else:
        save_mp4(output_path, frames, fps)


def save_gif(output_path: str, frames: Iterable[np.ndarray], fps: int) -> None:
    """PIL-based GIF writer (ref video.py:119-131)."""
    from PIL import Image

    pil = [Image.fromarray(np.asarray(f, np.uint8)) for f in frames]
    if not pil:
        raise ValueError("no frames to save")
    pil[0].save(output_path, save_all=True, append_images=pil[1:],
                duration=int(1000 / max(fps, 1)), loop=0)


def save_mp4(output_path: str, frames: Iterable[np.ndarray], fps: int) -> None:
    """cv2 VideoWriter; validates uniform frame sizes (ref video.py:134-172)."""
    import cv2

    writer = None
    shape = None
    for frame in frames:
        frame = np.asarray(frame, np.uint8)
        if writer is None:
            shape = frame.shape[:2]
            fourcc = cv2.VideoWriter_fourcc(*("mp4v" if output_path.lower().endswith(".mp4") else "XVID"))
            writer = cv2.VideoWriter(output_path, fourcc, float(fps), (shape[1], shape[0]))
        if frame.shape[:2] != shape:
            writer.release()
            raise RuntimeError(f"frame size {frame.shape[:2]} != first frame {shape}; all frames must match")
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    if writer is None:
        raise ValueError("no frames to save")
    writer.release()
    if not os.path.exists(output_path):
        raise RuntimeError(f"cv2 failed to write {output_path}")
