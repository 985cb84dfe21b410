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


class PlaybackStabilizer:
    """Playback-rate stabilizer for live display (eval.py:718-789).

    The producer fills a frame buffer at compute speed; the consumer
    paces itself so playback is smooth even when compute jitters: the
    per-frame sleep target drifts up when the buffer runs low (play
    slower, let the buffer refill) and down when it overfills, clamped
    at the source frame time for files (webcams may play faster).
    ``sleep_target(...)`` returns how long to wait before showing the
    next frame: ``max(2 * target - avg_frame_time, 0)`` — the reference's
    proportional correction toward the drifting target.
    """

    def __init__(self, target_fps: float, buffer_target: int,
                 is_webcam: bool = False, step: float = 0.0005):
        self.frame_time_target = 1.0 / max(target_fps, 1e-6)
        self.stabilized = self.frame_time_target
        self.buffer_target = buffer_target
        self.is_webcam = is_webcam
        self.step = step

    def sleep_target(self, buffer_size: int, avg_frame_time: float,
                     vid_done: bool = False) -> float:
        if not vid_done:
            if buffer_size < self.buffer_target:
                self.stabilized += self.step
            elif buffer_size > self.buffer_target:
                self.stabilized = max(self.stabilized - self.step, 0.0)
            new_target = self.stabilized if self.is_webcam else \
                max(self.stabilized, self.frame_time_target)
        else:
            new_target = self.frame_time_target
        return max(2 * new_target - avg_frame_time, 0.0)


def _display_available() -> bool:
    """True when cv2 can open a HighGUI window (headless rigs cannot).

    Checks the display environment BEFORE touching HighGUI: on a headless
    Linux box some cv2 builds abort() inside namedWindow instead of
    raising cv2.error, which would take the whole process down.

    Note: playback runs on a secondary thread (like the reference's
    play_video thread, eval.py:718) — macOS/Cocoa requires HighGUI on the
    main thread, so --display is unsupported there (same as upstream)."""
    import os
    import sys
    if sys.platform.startswith('linux') and \
            not (os.environ.get('DISPLAY') or
                 os.environ.get('WAYLAND_DISPLAY')):
        return False
    import cv2
    try:
        cv2.namedWindow('__yolact_probe__')
        cv2.destroyWindow('__yolact_probe__')
        return True
    except cv2.error:
        return False


def _play_loop(win_name, buffer_q, stabilizer, stop, producer_done,
               frame_times):
    """Consumer thread: imshow frames from the buffer at a stabilized
    rate; Escape closes (eval.py:752-758).  Always sets ``stop`` on exit —
    otherwise a dying GUI (lost X connection mid-run) would leave the
    producer retrying puts against a full buffer forever."""
    import cv2
    try:
        _play_loop_inner(win_name, buffer_q, stabilizer, stop,
                         producer_done, frame_times)
    finally:
        stop.set()
        try:
            cv2.destroyAllWindows()
        except Exception:
            pass


def _play_loop_inner(win_name, buffer_q, stabilizer, stop, producer_done,
                     frame_times):
    import cv2
    last = None
    while not stop.is_set():
        t0 = time.perf_counter()
        frame = None
        try:
            frame = buffer_q.get(timeout=0.05)
        except queue.Empty:
            if producer_done.is_set():
                break
        if frame is None and producer_done.is_set() and buffer_q.empty():
            break
        if frame is not None:
            now = time.perf_counter()
            if last is not None:
                frame_times.add(now - last)
            last = now
            cv2.imshow(win_name, frame)
        if cv2.waitKey(1) == 27:      # Escape closes
            stop.set()
            break
        target = stabilizer.sleep_target(
            buffer_q.qsize(), frame_times.get_avg(),
            vid_done=producer_done.is_set())
        deadline = t0 + target - 0.001
        while time.perf_counter() < deadline and not stop.is_set():
            time.sleep(0.001)
    cv2.destroyAllWindows()


def evalvideo(cfg: YolactConfig, variables, path: str,
              out_path: Optional[str] = None,
              video_multiframe: int = 4,
              maskiou_variables=None,
              score_threshold: float = 0.15,
              top_k: int = 15,
              display_fps: bool = True,
              emulate_playback: bool = False,
              display: bool = False,
              max_frames: int = -1,
              fast_nms: bool = True,
              cross_class_nms: bool = False,
              crop_masks: bool = True) -> float:
    """Returns average end-to-end fps.  `path` may be a file or a webcam
    index string (eval.py:644-650).  ``display=True`` plays frames live
    in a cv2 window through the buffered stabilizer consumer (falls back
    to headless processing with a warning when no display is available);
    the reference only displays when not writing, kept here."""
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

    display = display and out_path is None
    if display and not _display_available():
        print('No display available; processing without playback window.')
        display = False
    play_thread = None
    buffer_q: Optional["queue.Queue"] = None
    producer_done = threading.Event()

    # the reference applies the NMS flags to the video path too
    # (eval.py:871-872 set them on net.detect before dispatch)
    if fast_nms:
        pipeline = Pipeline(cfg, variables,
                            maskiou_variables=maskiou_variables,
                            preprocess=True,
                            use_cross_class_nms=cross_class_nms,
                            score_threshold=score_threshold,
                            crop_masks=crop_masks)
    else:
        from yolact_tpu.eval.traditional import TraditionalPipeline
        pipeline = TraditionalPipeline(cfg, variables, preprocess=True,
                                       score_threshold=score_threshold,
                                       maskiou_variables=maskiou_variables,
                                       crop_masks=crop_masks)

    # frame size is fixed for a video: upsample+binarize the padded masks on
    # device in the same jitted program scope instead of per-frame cv2 on
    # the host (this host has 1 core; 100 cv2 resizes/frame would dominate).
    # Direct masks (mask_type=0) are box-local patches — those go through
    # the host paste path instead (output_utils.py:101-120 semantics).
    import jax
    from yolact_tpu.config import MaskType
    from yolact_tpu.detect.postprocess import (finish_masks_direct,
                                               upsample_masks_device)
    direct_masks = cfg.mask_type == MaskType.DIRECT
    upsample = (lambda m: m) if direct_masks else \
        jax.jit(lambda m: upsample_masks_device(m, (fh, fw)))

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
                # stop-aware put: after Escape the consumer no longer
                # drains, and a blocking put would leak this thread (and
                # race cap.release() against cap.read())
                while not stop.is_set():
                    try:
                        frame_q.put(frames, timeout=0.25)
                        break
                    except queue.Full:
                        continue
        except Exception:
            # surface reader-thread failures instead of hanging the consumer
            # (reference logs pipeline-thread exceptions, eval.py:785-789)
            import traceback
            traceback.print_exc()
        finally:
            while True:  # EOF sentinel; bail if the consumer stopped
                try:
                    frame_q.put(None, timeout=0.25)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    if display:
        # bounded: when compute outruns playback (the common case — the
        # consumer is clamped to source fps for files) the producer blocks
        # on put(), so at most ~2s of frames ever sit in memory instead of
        # the whole video
        buffer_q = queue.Queue(maxsize=max(2 * target_fps,
                                           4 * video_multiframe))
        stabilizer = PlaybackStabilizer(target_fps, video_multiframe,
                                        is_webcam=is_webcam)
        play_thread = threading.Thread(
            target=_play_loop,
            args=(path, buffer_q, stabilizer, stop, producer_done,
                  MovingAverage(100)),
            daemon=True)
        play_thread.start()

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
        # prep_display forces rescore_bbox=True (reference eval.py:147-149):
        # plus configs draw maskiou-rescored scores
        if out.mask_scores is not None and cfg.rescore_mask:
            scores = np.asarray(out.mask_scores)
        else:
            scores = np.asarray(out.scores)
        boxes = np.asarray(out.boxes)
        masks_full_np = np.asarray(masks_full_dev)

        for i in range(n_real):
            h, w = frames[i].shape[:2]
            n = int(valid[i].sum())
            boxes_abs = sanitize_boxes_np(boxes[i][:n], w, h)
            if direct_masks:
                full_masks = finish_masks_direct(masks_full_np[i][:n],
                                                 boxes_abs, w, h)
            else:
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
            if buffer_q is not None:
                # bounded-put with a stop check so Escape in the playback
                # window can't leave the producer blocked on a full queue
                while not stop.is_set():
                    try:
                        buffer_q.put(img, timeout=0.1)
                        break
                    except queue.Full:
                        pass
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
        if stop.is_set():          # Escape in the playback window
            break
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
    producer_done.set()
    if play_thread is not None:
        # remaining playback is bounded by the buffer size at source fps
        drain_s = (buffer_q.qsize() if buffer_q is not None else 0) \
            / max(target_fps, 1) + 10
        play_thread.join(timeout=drain_s)
    stop.set()
    # the reader must be out of cap.read() before release — VideoCapture
    # is not thread-safe and a concurrent release can segfault
    t.join(timeout=5)
    cap.release()
    if writer is not None:
        writer.release()
    return fps
