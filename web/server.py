"""Detection-viewer web server.

Fresh implementation of the reference's viewer server (``web/server.py``):
serves the static viewer, lists available detection JSON files at
``/detindex``, and serves dataset images at ``/image<id>`` from a
configurable image root.

Usage: python web/server.py [--port 8000] [--images data/coco/images]
"""

import argparse
import json
import os
import re
from http.server import HTTPServer, SimpleHTTPRequestHandler

WEB_ROOT = os.path.dirname(os.path.abspath(__file__))


def make_handler(image_root: str):
    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=WEB_ROOT, **kw)

        def do_GET(self):
            if self.path == '/detindex':
                dets_dir = os.path.join(WEB_ROOT, 'dets')
                names = sorted(f[:-5] for f in os.listdir(dets_dir)
                               if f.endswith('.json')) \
                    if os.path.isdir(dets_dir) else []
                body = json.dumps(names).encode()
                self.send_response(200)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            m = re.match(r'^/image(\d+)$', self.path)
            if m:
                img_id = int(m.group(1))
                path = os.path.join(image_root, f'{img_id:012d}.jpg')
                if not os.path.exists(path):
                    # checked-in demo assets (scripts/make_web_demo.py) so
                    # the viewer works out of the box without COCO
                    path = os.path.join(WEB_ROOT, 'demo_images',
                                        f'{img_id:012d}.jpg')
                if os.path.exists(path):
                    with open(path, 'rb') as f:
                        body = f.read()
                    self.send_response(200)
                    self.send_header('Content-Type', 'image/jpeg')
                    self.send_header('Content-Length', str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_error(404, f'image {img_id} not found')
                return
            super().do_GET()
    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--images', type=str, default='data/coco/images')
    args = p.parse_args()
    server = HTTPServer(('0.0.0.0', args.port), make_handler(args.images))
    print(f'Serving viewer on http://localhost:{args.port}')
    server.serve_forever()


if __name__ == '__main__':
    main()
