"""Web detection-viewer server smoke test (web/server.py, the reference's
``web/server.py`` equivalent): /detindex listing, static viewer, /image<id>
lookup from the image root."""

import json
import os
import sys
import threading
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'web'))


def test_web_server_endpoints(tmp_path):
    import cv2
    import numpy as np
    import server as web_server

    img_root = tmp_path / 'images'
    img_root.mkdir()
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(img_root / '000000000042.jpg'), img)

    dets_dir = os.path.join(web_server.WEB_ROOT, 'dets')
    os.makedirs(dets_dir, exist_ok=True)
    probe = os.path.join(dets_dir, 'pytest_probe.json')
    with open(probe, 'w') as f:
        json.dump({'info': {}, 'images': []}, f)

    handler = web_server.make_handler(str(img_root))
    from http.server import HTTPServer
    httpd = HTTPServer(('127.0.0.1', 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        idx = json.loads(urllib.request.urlopen(
            f'http://127.0.0.1:{port}/detindex', timeout=10).read())
        assert 'pytest_probe' in idx

        page = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/index.html', timeout=10).read()
        assert b'<html' in page.lower()

        raw = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/image42', timeout=10).read()
        dec = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
        assert dec is not None and dec.shape == (32, 32, 3)

        # the IoU inspector page serves and references its scripts
        iou = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/iou.html', timeout=10).read()
        assert b'playground' in iou and b'iou.js' in iou

        # checked-in demo det sets make the inspector render data out of
        # the box (scripts/make_web_demo.py)
        assert 'tiny_demo_trained' in idx and 'tiny_demo_early' in idx
        demo = json.loads(urllib.request.urlopen(
            f'http://127.0.0.1:{port}/dets/tiny_demo_trained.json',
            timeout=10).read())
        assert demo['images'] and demo['images'][0]['dets']
        det = demo['images'][0]['dets'][0]
        assert {'score', 'bbox', 'category', 'mask'} <= set(det)

        # demo-image fallback: id 100 is not in the test image root but
        # ships in web/demo_images
        raw = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/image100', timeout=10).read()
        dec = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
        assert dec is not None and dec.shape[2] == 3
    finally:
        httpd.shutdown()
        os.remove(probe)


def test_demo_dets_masks_decode():
    """The demo det masks round-trip through the same RLE codec rle.js
    implements, at the demo images' canvas size."""
    import numpy as np

    from yolact_tpu.data import rle as rle_codec
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, 'web', 'dets',
                           'tiny_demo_trained.json')) as f:
        demo = json.load(f)
    det = demo['images'][0]['dets'][0]
    m = rle_codec.rle_to_mask({'size': det['mask']['size'],
                               'counts': det['mask']['counts'].encode()})
    assert m.shape == tuple(det['mask']['size'])
    assert m.dtype in (np.uint8, np.bool_) and int(m.max()) <= 1


def test_tpuinfo_device_info():
    from yolact_tpu.utils.tpuinfo import device_info
    info = device_info()
    assert len(info) >= 1
    assert {'id', 'platform', 'kind'} <= set(info[0])
