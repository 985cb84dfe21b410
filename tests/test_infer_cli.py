import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config


def test_traditional_nms_agrees_with_fast_on_sparse(rng):
    """On well-separated boxes both NMS variants keep the same detections."""
    from yolact_tpu.eval.traditional import traditional_nms
    cfg = tiny_resnet_config()
    P, Cm1, Md = 40, cfg.num_classes - 1, 4
    boxes = np.zeros((P, 4), np.float32)
    scores = np.full((Cm1, P), 1e-4, np.float32)
    # 4 separated confident boxes of distinct classes
    for i in range(4):
        x = 0.05 + 0.24 * i
        boxes[i] = [x, x, x + 0.1, x + 0.1]
        scores[i % Cm1, i] = 0.9 - 0.1 * i
    coeffs = rng.randn(P, Md).astype(np.float32)
    b, c, cls, s = traditional_nms(cfg, boxes, coeffs, scores)
    assert len(s) == 4
    np.testing.assert_allclose(sorted(s, reverse=True), s)


def test_traditional_nms_suppresses_overlaps(rng):
    from yolact_tpu.eval.traditional import traditional_nms
    cfg = tiny_resnet_config()
    P, Cm1, Md = 10, cfg.num_classes - 1, 4
    boxes = np.tile(np.array([[0.2, 0.2, 0.6, 0.6]], np.float32), (P, 1))
    boxes += rng.randn(P, 4).astype(np.float32) * 0.002
    scores = np.full((Cm1, P), 1e-4, np.float32)
    scores[0, :] = np.linspace(0.9, 0.5, P)
    coeffs = rng.randn(P, Md).astype(np.float32)
    b, c, cls, s = traditional_nms(cfg, boxes, coeffs, scores)
    assert len(s) == 1 and cls[0] == 0


def test_traditional_pipeline_maskiou_rescoring(rng):
    """--fast_nms=False must apply YOLACT++ maskiou rescoring: the
    reference does it in postprocess (output_utils.py:79-88) so it covers
    BOTH NMS variants.  Regression: the traditional path silently dropped
    it, deviating plus-config mAP."""
    import jax
    import jax.numpy as jnp
    from yolact_tpu.eval.traditional import TraditionalPipeline
    from yolact_tpu.infer import random_variables
    from yolact_tpu.models.yolact import MaskIoUHead

    cfg = tiny_resnet_config(use_maskiou=True,
                             maskiou_net=((8, 3, (('stride', 2),)),))
    variables = random_variables(cfg)
    Hp = cfg.max_size // 4
    miou_vars = MaskIoUHead(cfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, Hp, Hp, 1), jnp.float32))

    img = (rng.rand(1, cfg.max_size, cfg.max_size, 3) * 255).astype(
        np.float32)
    pipe = TraditionalPipeline(cfg, variables, preprocess=True,
                               maskiou_variables=miou_vars)
    out = pipe(img)
    assert out.mask_scores is not None

    # wiring check vs an independent application of the maskiou net on
    # the pipeline's own assembled masks (classes gather + score product)
    B, D, hp, wp = out.masks.shape
    iou_p = np.asarray(MaskIoUHead(cfg).apply(
        miou_vars, jnp.asarray(out.masks.reshape(B * D, hp, wp, 1)))
    ).reshape(B, D, -1)
    cls = np.clip(out.classes, 0, iou_p.shape[-1] - 1)
    sel = np.take_along_axis(iou_p, cls[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(out.mask_scores, out.scores * sel,
                               rtol=1e-5, atol=1e-6)

    # without maskiou variables the field stays None (non-plus parity)
    out2 = TraditionalPipeline(cfg, variables, preprocess=True)(img)
    assert out2.mask_scores is None


@pytest.fixture(scope='module')
def tiny_ckpt(tmp_path_factory):
    """Random-weight tiny checkpoint on disk + matching config name."""
    from yolact_tpu.config import register_config
    from yolact_tpu.infer import random_variables
    from yolact_tpu.train.checkpoint import save_weights_only

    cfg = tiny_resnet_config()
    register_config(cfg, 'tinytest')
    cfg = cfg.copy(name='tinytest')
    register_config(cfg)
    tmp = tmp_path_factory.mktemp('w')
    path = str(tmp / 'tinytest_0_100.ckpt')
    variables = random_variables(cfg)
    save_weights_only(variables, path)
    return cfg, path


def test_cli_evalimage(tiny_ckpt, tmp_path):
    import cv2
    from yolact_tpu.cli.eval import main
    cfg, ckpt = tiny_ckpt
    img = (np.random.RandomState(0).rand(90, 120, 3) * 255).astype(np.uint8)
    inp = str(tmp_path / 'in.jpg')
    out = str(tmp_path / 'out.png')
    cv2.imwrite(inp, img)
    main(['--trained_model', ckpt, f'--image={inp}:{out}',
          '--score_threshold=0.0'])
    res = cv2.imread(out)
    assert res is not None and res.shape == (90, 120, 3)


def test_cli_video(tiny_ckpt, tmp_path):
    import cv2
    cfg, ckpt = tiny_ckpt
    vid_in = str(tmp_path / 'in.mp4')
    vw = cv2.VideoWriter(vid_in, cv2.VideoWriter_fourcc(*'mp4v'), 10,
                         (96, 64))
    rng = np.random.RandomState(0)
    for _ in range(6):
        vw.write((rng.rand(64, 96, 3) * 255).astype(np.uint8))
    vw.release()

    from yolact_tpu.eval.video import evalvideo
    from yolact_tpu.train.checkpoint import load_weights
    variables = load_weights(cfg, ckpt)
    out = str(tmp_path / 'out.mp4')
    fps = evalvideo(cfg, variables, vid_in, out, video_multiframe=2,
                    score_threshold=0.0, max_frames=6)
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    assert round(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()


def test_display_lincomb(tmp_path, rng):
    from yolact_tpu.eval.display import display_lincomb
    proto = rng.rand(16, 16, 8).astype(np.float32)
    coeffs = np.tanh(rng.randn(3, 8)).astype(np.float32)
    out = str(tmp_path / 'lincomb.png')
    grid = display_lincomb(proto, coeffs, out_path=out)
    assert os.path.exists(out)
    assert grid.shape[0] % 16 == 0


def test_cli_evalimage_lincomb(tiny_ckpt, tmp_path):
    import cv2
    from yolact_tpu.cli.eval import main
    cfg, ckpt = tiny_ckpt
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    inp = str(tmp_path / 'in.jpg')
    cv2.imwrite(inp, img)
    main(['--trained_model', ckpt, f'--image={inp}',
          '--display_lincomb=True'])
    assert os.path.exists(str(tmp_path / 'in_lincomb.png'))


def test_cli_evalimages_directory(tiny_ckpt, tmp_path):
    """--images in_dir:out_dir renders every image (eval.py:612-634)."""
    import cv2
    from yolact_tpu.cli.eval import main
    cfg, ckpt = tiny_ckpt
    ind = tmp_path / 'in'
    outd = tmp_path / 'out'
    ind.mkdir()
    rng = np.random.RandomState(3)
    for i in range(2):
        cv2.imwrite(str(ind / f'im{i}.jpg'),
                    (rng.rand(50, 60, 3) * 255).astype(np.uint8))
    main(['--trained_model', ckpt, f'--images={ind}:{outd}',
          '--score_threshold=0.0'])
    outs = sorted(os.listdir(outd))
    assert outs == ['im0.png', 'im1.png']
    for f in outs:
        img = cv2.imread(str(outd / f))
        assert img is not None and img.shape == (50, 60, 3)


def test_cli_video_maskiou_rescored_display(tmp_path, rng):
    """evalvideo with a plus-style config draws maskiou-rescored scores
    (prep_display rescore_bbox=True parity) without crashing."""
    import cv2
    import jax
    import jax.numpy as jnp
    from yolact_tpu.eval.video import evalvideo
    from yolact_tpu.infer import random_variables
    from yolact_tpu.models.yolact import MaskIoUHead

    cfg = tiny_resnet_config(use_maskiou=True,
                             maskiou_net=((8, 3, (('stride', 2),)),))
    variables = random_variables(cfg)
    Hp = cfg.max_size // 4
    miou_vars = MaskIoUHead(cfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, Hp, Hp, 1), jnp.float32))

    vid_in = str(tmp_path / 'in.mp4')
    vw = cv2.VideoWriter(vid_in, cv2.VideoWriter_fourcc(*'mp4v'), 10,
                         (96, 64))
    for _ in range(4):
        vw.write((rng.rand(64, 96, 3) * 255).astype(np.uint8))
    vw.release()
    out = str(tmp_path / 'out.mp4')
    evalvideo(cfg, variables, vid_in, out, video_multiframe=2,
              maskiou_variables=miou_vars, score_threshold=0.0,
              max_frames=4)
    cap = cv2.VideoCapture(out)
    assert round(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()


def test_playback_stabilizer_drift():
    """The stabilizer's pacing rule (eval.py:764-778): sleep target
    drifts UP while the buffer runs below video_multiframe, DOWN when it
    overfills (clamped at the source frame time for files), and reverts
    to the plain frame time once the producer is done."""
    from yolact_tpu.eval.video import PlaybackStabilizer

    ft = 1 / 30
    st = PlaybackStabilizer(target_fps=30, buffer_target=4)
    # buffer starving -> target grows monotonically
    prev = st.sleep_target(0, ft)
    grew = [st.sleep_target(0, ft) for _ in range(20)]
    assert all(b >= a for a, b in zip([prev] + grew, grew))
    assert st.stabilized > ft
    # buffer overfull -> internal target shrinks back toward zero, but a
    # FILE's playback never paces faster than the source frame rate
    for _ in range(200):
        st.sleep_target(50, ft)
    assert st.stabilized == 0.0
    assert st.sleep_target(50, 0.0) == 2 * ft  # floor: 2*frame_time - avg
    # a webcam may play as fast as frames arrive
    cam = PlaybackStabilizer(target_fps=30, buffer_target=4, is_webcam=True)
    for _ in range(200):
        cam.sleep_target(50, ft)
    assert cam.sleep_target(50, ft) == 0.0
    # producer done -> fixed source-rate pacing, no more drift
    st2 = PlaybackStabilizer(target_fps=30, buffer_target=4)
    assert st2.sleep_target(0, ft, vid_done=True) == pytest.approx(ft)
    assert st2.stabilized == pytest.approx(ft)  # untouched


def test_cli_video_display_headless_fallback(tiny_ckpt, tmp_path):
    """--display on a headless rig must degrade to plain processing (the
    reference crashes in cv2.imshow; we probe and warn instead)."""
    import cv2
    from yolact_tpu.eval.video import _display_available, evalvideo
    from yolact_tpu.train.checkpoint import load_weights

    cfg, ckpt = tiny_ckpt
    vid_in = str(tmp_path / 'in.mp4')
    vw = cv2.VideoWriter(vid_in, cv2.VideoWriter_fourcc(*'mp4v'), 10,
                         (96, 64))
    rng = np.random.RandomState(0)
    for _ in range(4):
        vw.write((rng.rand(64, 96, 3) * 255).astype(np.uint8))
    vw.release()
    if _display_available():  # pragma: no cover - headless CI
        pytest.skip('display available; fallback path not reachable')
    variables = load_weights(cfg, ckpt)
    fps = evalvideo(cfg, variables, vid_in, None, video_multiframe=2,
                    score_threshold=0.0, max_frames=4, display=True)
    assert fps >= 0


def test_cli_eval_no_crop_changes_masks(tiny_ckpt, tmp_path):
    """--no_crop must reach the mask-assembly stage (reference passes
    crop_masks=args.crop into postprocess, eval.py:403)."""
    import jax.numpy as jnp
    from yolact_tpu.infer import Pipeline
    from yolact_tpu.train.checkpoint import load_weights
    cfg, ckpt = tiny_ckpt
    variables = load_weights(cfg, ckpt)
    img = (np.random.RandomState(1).rand(1, cfg.max_size, cfg.max_size, 3)
           * 255).astype(np.float32)
    out_c = Pipeline(cfg, variables, preprocess=True, crop_masks=True)(img)
    out_n = Pipeline(cfg, variables, preprocess=True, crop_masks=False)(img)
    n = int(np.asarray(out_c.valid[0]).sum())
    assert n > 0
    # uncropped masks have at least as much mass, strictly more somewhere
    mc = np.asarray(out_c.masks[0, :n])
    mn = np.asarray(out_n.masks[0, :n])
    assert (mn >= mc - 1e-6).all()
    assert mn.sum() > mc.sum()


def test_cli_video_traditional_nms(tiny_ckpt, tmp_path):
    """--fast_nms=False reaches the video path (reference eval.py:871-872
    sets the NMS flags before dispatching to evalvideo)."""
    import cv2
    cfg, ckpt = tiny_ckpt
    vid_in = str(tmp_path / 'in.mp4')
    vw = cv2.VideoWriter(vid_in, cv2.VideoWriter_fourcc(*'mp4v'), 10,
                         (96, 64))
    rng = np.random.RandomState(0)
    for _ in range(4):
        vw.write((rng.rand(64, 96, 3) * 255).astype(np.uint8))
    vw.release()

    from yolact_tpu.eval.video import evalvideo
    from yolact_tpu.train.checkpoint import load_weights
    variables = load_weights(cfg, ckpt)
    out = str(tmp_path / 'out.mp4')
    evalvideo(cfg, variables, vid_in, out, video_multiframe=2,
              score_threshold=0.0, max_frames=4, fast_nms=False)
    cap = cv2.VideoCapture(out)
    assert round(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()
