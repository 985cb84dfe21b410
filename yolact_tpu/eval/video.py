"""Real-time video pipeline.

TPU-native redesign of ``evalvideo`` (``eval.py:636-868``).  The reference
builds a 3-stage ThreadPool software pipeline (transform / network / draw)
around per-frame GPU calls; here the whole compute path is ONE jitted batched
program (device-side resize+normalize fused in — the FastBaseTransform
equivalent), so the host pipeline reduces to:

  reader thread  ->  [batch of frames]  ->  jitted step  ->  drawer thread

with a bounded queue providing the double buffering.  `video_multiframe`
frames per batch, padded batch for the final chunk (eval.py:700-707).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import numpy as np

from yolact_tpu.config import YolactConfig
from yolact_tpu.eval.display import draw_detections
from yolact_tpu.eval.evaluate import sanitize_boxes_np
from yolact_tpu.infer import Pipeline
from yolact_tpu.utils.functions import MovingAverage


def evalvideo(cfg: YolactConfig, variables, path: str,
              out_path: Optional[str] = None,
              video_multiframe: int = 4,
              maskiou_variables=None,
              score_threshold: float = 0.15,
              top_k: int = 15,
              display_fps: bool = True,
              emulate_playback: bool = False,
              max_frames: int = -1) -> float:
    """Returns average end-to-end fps.  `path` may be a file or a webcam
    index string (eval.py:644-650)."""
    import cv2

    is_webcam = path.isdigit()
    cap = cv2.VideoCapture(int(path) if is_webcam else path)
    if not cap.isOpened():
        raise FileNotFoundError(f'could not open video {path}')

    target_fps = round(cap.get(cv2.CAP_PROP_FPS)) or 30
    fw = round(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    fh = round(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    num_frames = round(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if max_frames > 0:
        num_frames = min(num_frames, max_frames) if num_frames > 0 \
            else max_frames

    writer = None
    if out_path is not None:
        writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                                 target_fps, (fw, fh))

    pipeline = Pipeline(cfg, variables, maskiou_variables=maskiou_variables,
                        preprocess=True, score_threshold=score_threshold)

    # frame size is fixed for a video: upsample+binarize the padded masks on
    # device in the same jitted program scope instead of per-frame cv2 on
    # the host (this host has 1 core; 100 cv2 resizes/frame would dominate)
    import jax
    from yolact_tpu.detect.postprocess import upsample_masks_device
    upsample = jax.jit(lambda m: upsample_masks_device(m, (fh, fw)))

    frame_q: "queue.Queue" = queue.Queue(maxsize=3)
    stop = threading.Event()

    def reader():
        read = 0
        try:
            while not stop.is_set() and (num_frames <= 0 or read < num_frames):
                frames = []
                for _ in range(video_multiframe):
                    ok, frame = cap.read()
                    if not ok:
                        break
                    frames.append(frame)
                    read += 1
                    if num_frames > 0 and read >= num_frames:
                        break
                if not frames:
                    break
                frame_q.put(frames)
        except Exception:
            # surface reader-thread failures instead of hanging the consumer
            # (reference logs pipeline-thread exceptions, eval.py:785-789)
            import traceback
            traceback.print_exc()
        finally:
            frame_q.put(None)

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    frame_times = MovingAverage(100)
    fps = 0.0
    processed = 0
    t_last = time.perf_counter()

    def drain(entry):
        """Fetch a dispatched batch's results and draw/encode its frames."""
        nonlocal fps, processed, t_last
        frames, n_real, out, masks_full_dev = entry
        valid = np.asarray(out.valid)
        classes = np.asarray(out.classes)
        scores = np.asarray(out.scores)
        boxes = np.asarray(out.boxes)
        masks_full_np = np.asarray(masks_full_dev)

        for i in range(n_real):
            h, w = frames[i].shape[:2]
            n = int(valid[i].sum())
            boxes_abs = sanitize_boxes_np(boxes[i][:n], w, h)
            full_masks = masks_full_np[i][:n]
            now = time.perf_counter()
            frame_times.add(now - t_last)
            t_last = now
            fps = 1.0 / max(frame_times.get_avg(), 1e-6)
            img = draw_detections(
                cfg, frames[i], classes[i][:n], scores[i][:n], boxes_abs,
                full_masks, top_k=top_k, score_threshold=score_threshold,
                fps_str=f'{fps:.1f} fps' if display_fps else '')
            if writer is not None:
                writer.write(img)
            processed += 1
            if emulate_playback:
                # pace output at the source frame rate (eval.py:718-789
                # playback-rate stabilizer)
                budget = 1.0 / target_fps - (time.perf_counter() - now)
                if budget > 0:
                    time.sleep(budget)

        print(f'\rProcessing: {processed} frames | {fps:.2f} fps  ', end='')

    # one-batch lookahead: jax dispatch is async, so enqueueing batch N+1
    # BEFORE fetching batch N's results keeps the chip busy while the host
    # draws/encodes — the device-side analogue of the reference's 3-stage
    # ThreadPool overlap (eval.py:799-857)
    pending = None
    eof = False
    while not (eof and pending is None):
        current = None
        if not eof:
            frames = frame_q.get()
            if frames is None:
                eof = True
            else:
                batch = np.stack([f.astype(np.float32) for f in frames])
                # pad the last short batch so the jitted shape stays fixed
                n_real = len(frames)
                if n_real < video_multiframe:
                    pad = np.repeat(batch[-1:],
                                    video_multiframe - n_real, axis=0)
                    batch = np.concatenate([batch, pad], axis=0)
                out = pipeline(batch)
                current = (frames, n_real, out, upsample(out.masks))
        if pending is not None:
            drain(pending)
        pending = current

    print()
    stop.set()
    cap.release()
    if writer is not None:
        writer.release()
    return fps
