// IoU inspector (web/iou.html) + shared IoU math for the viewer.
//
// Two halves, both fresh implementations of the reference page's ideas
// (reference web/iou.html + web/scripts/iou.js): an interactive canvas
// playground with two draggable/resizable boxes and a live IoU readout,
// and — beyond the reference — a det-set comparison that matches two
// models' detections on one image and tabulates per-instance mask/box
// IoU using rle.js.

function boxIoU(a, b) {
  // boxes are [x, y, w, h]
  const ax2 = a[0] + a[2], ay2 = a[1] + a[3];
  const bx2 = b[0] + b[2], by2 = b[1] + b[3];
  const iw = Math.max(0, Math.min(ax2, bx2) - Math.max(a[0], b[0]));
  const ih = Math.max(0, Math.min(ay2, by2) - Math.max(a[1], b[1]));
  const inter = iw * ih;
  const union = a[2] * a[3] + b[2] * b[3] - inter;
  return union > 0 ? inter / union : 0;
}

function maskIoU(ma, mb) {
  if (ma.h !== mb.h || ma.w !== mb.w) return 0;
  let inter = 0, a = 0, b = 0;
  const n = ma.h * ma.w;
  for (let i = 0; i < n; i++) {
    const va = ma.data[i], vb = mb.data[i];
    inter += va & vb;
    a += va; b += vb;
  }
  const union = a + b - inter;
  return union > 0 ? inter / union : 0;
}

// Greedy per-instance matching of two det lists by descending pairwise
// IoU (mask IoU when both dets carry masks, else box IoU).
function matchDetSets(detsA, detsB) {
  const masksA = detsA.map(d => d.mask ? rleToMask(d.mask) : null);
  const masksB = detsB.map(d => d.mask ? rleToMask(d.mask) : null);
  const pairs = [];
  for (let i = 0; i < detsA.length; i++)
    for (let j = 0; j < detsB.length; j++) {
      const miou = (masksA[i] && masksB[j]) ? maskIoU(masksA[i], masksB[j]) : null;
      const biou = boxIoU(detsA[i].bbox, detsB[j].bbox);
      pairs.push({ i, j, miou, biou, key: miou !== null ? miou : biou });
    }
  pairs.sort((p, q) => q.key - p.key);
  const usedA = new Set(), usedB = new Set(), matches = [];
  for (const p of pairs) {
    if (p.key <= 0 || usedA.has(p.i) || usedB.has(p.j)) continue;
    usedA.add(p.i); usedB.add(p.j); matches.push(p);
  }
  for (let i = 0; i < detsA.length; i++)
    if (!usedA.has(i)) matches.push({ i, j: null, miou: null, biou: null });
  for (let j = 0; j < detsB.length; j++)
    if (!usedB.has(j)) matches.push({ i: null, j, miou: null, biou: null });
  return matches;
}

// ----- interactive playground -------------------------------------------

(function () {
  if (typeof document === 'undefined') return;
  const canvas = document.getElementById('playground');
  if (!canvas) return;  // viewer.html only wants the math above
  const ctx = canvas.getContext('2d');
  const HS = 8;  // handle size

  const boxes = [
    { x: 120, y: 90, w: 180, h: 160, fill: 'rgba(233,30,99,0.55)' },
    { x: 230, y: 170, w: 190, h: 150, fill: 'rgba(3,169,244,0.55)' },
  ];
  let drag = null;   // {box, mode: 'move'|handleIdx, ox, oy}

  // handle layout: 0 1 2 / 3 4 / 5 6 7 (corners + edge midpoints)
  function handles(b) {
    const xs = [b.x, b.x + b.w / 2, b.x + b.w];
    const ys = [b.y, b.y + b.h / 2, b.y + b.h];
    return [[xs[0], ys[0]], [xs[1], ys[0]], [xs[2], ys[0]],
            [xs[0], ys[1]], [xs[2], ys[1]],
            [xs[0], ys[2]], [xs[1], ys[2]], [xs[2], ys[2]]];
  }

  function draw() {
    ctx.clearRect(0, 0, canvas.width, canvas.height);
    for (const b of boxes) {
      ctx.fillStyle = b.fill;
      ctx.fillRect(b.x, b.y, b.w, b.h);
      ctx.strokeStyle = '#fff';
      ctx.strokeRect(b.x, b.y, b.w, b.h);
      ctx.fillStyle = '#fff';
      for (const [hx, hy] of handles(b))
        ctx.fillRect(hx - HS / 2, hy - HS / 2, HS, HS);
    }
    const iou = boxIoU([boxes[0].x, boxes[0].y, boxes[0].w, boxes[0].h],
                       [boxes[1].x, boxes[1].y, boxes[1].w, boxes[1].h]);
    document.getElementById('iouval').textContent = iou.toFixed(4);
  }

  function pick(mx, my) {
    for (let bi = boxes.length - 1; bi >= 0; bi--) {
      const b = boxes[bi];
      const hs = handles(b);
      for (let k = 0; k < hs.length; k++)
        if (Math.abs(mx - hs[k][0]) <= HS && Math.abs(my - hs[k][1]) <= HS)
          return { box: b, mode: k };
      if (mx >= b.x && mx <= b.x + b.w && my >= b.y && my <= b.y + b.h)
        return { box: b, mode: 'move', ox: mx - b.x, oy: my - b.y };
    }
    return null;
  }

  function resize(b, k, mx, my) {
    const x2 = b.x + b.w, y2 = b.y + b.h;
    if ([0, 3, 5].includes(k)) { b.x = Math.min(mx, x2 - 4); b.w = x2 - b.x; }
    if ([2, 4, 7].includes(k)) { b.w = Math.max(4, mx - b.x); }
    if ([0, 1, 2].includes(k)) { b.y = Math.min(my, y2 - 4); b.h = y2 - b.y; }
    if ([5, 6, 7].includes(k)) { b.h = Math.max(4, my - b.y); }
  }

  function mouse(e) {
    const r = canvas.getBoundingClientRect();
    return [e.clientX - r.left, e.clientY - r.top];
  }

  canvas.addEventListener('mousedown', e => { drag = pick(...mouse(e)); });
  canvas.addEventListener('mouseup', () => { drag = null; });
  canvas.addEventListener('mousemove', e => {
    if (!drag) return;
    const [mx, my] = mouse(e);
    if (drag.mode === 'move') { drag.box.x = mx - drag.ox; drag.box.y = my - drag.oy; }
    else resize(drag.box, drag.mode, mx, my);
    draw();
  });
  draw();

  // ----- det-set comparison ---------------------------------------------

  const $ = id => document.getElementById(id);
  const state = { a: null, b: null };

  async function loadSets() {
    const [na, nb] = [$('modelA').value, $('modelB').value];
    state.a = await (await fetch(`dets/${na}.json`)).json();
    state.b = await (await fetch(`dets/${nb}.json`)).json();
    const ids = state.a.images.map(im => im.image_id);
    $('imageSel').innerHTML = ids.map(i => `<option>${i}</option>`).join('');
    compare();
  }

  function detsFor(data, imageId, thresh) {
    const im = data.images.find(x => x.image_id === imageId);
    return im ? im.dets.filter(d => d.score >= thresh) : [];
  }

  async function compare() {
    if (!state.a || !state.b) return;
    const imageId = parseInt($('imageSel').value, 10);
    const thresh = parseFloat($('thresh').value);
    const detsA = detsFor(state.a, imageId, thresh);
    const detsB = detsFor(state.b, imageId, thresh);
    const matches = matchDetSets(detsA, detsB);

    const rows = matches.map(m => {
      const a = m.i !== null ? detsA[m.i] : null;
      const bb = m.j !== null ? detsB[m.j] : null;
      const cls = v => v === null ? '' : (v >= 0.7 ? 'hi' : 'lo');
      const fmt = v => v === null ? '&mdash;' : v.toFixed(3);
      return `<tr><td>${a ? a.category : '&mdash;'}</td>` +
             `<td>${a ? a.score.toFixed(2) : '&mdash;'}</td>` +
             `<td>${bb ? bb.category : '&mdash;'}</td>` +
             `<td>${bb ? bb.score.toFixed(2) : '&mdash;'}</td>` +
             `<td class="${cls(m.miou)}">${fmt(m.miou)}</td>` +
             `<td class="${cls(m.biou)}">${fmt(m.biou)}</td></tr>`;
    });
    $('ioutable').innerHTML =
      '<table><tr><th>A class</th><th>A score</th><th>B class</th>' +
      '<th>B score</th><th>mask IoU</th><th>box IoU</th></tr>' +
      rows.join('') + '</table>';

    // overlay: A in red, B in blue over the image
    const img = new Image();
    img.onload = () => {
      const cv = $('overlay');
      cv.width = img.width; cv.height = img.height;
      const c2 = cv.getContext('2d');
      c2.drawImage(img, 0, 0);
      for (const [dets, color] of [[detsA, '#f06292'], [detsB, '#4fc3f7']]) {
        c2.strokeStyle = color; c2.lineWidth = 2;
        for (const d of dets)
          c2.strokeRect(d.bbox[0], d.bbox[1], d.bbox[2], d.bbox[3]);
      }
    };
    img.src = `/image${imageId}`;
  }

  (async function initCompare() {
    const models = await (await fetch('/detindex')).json();
    const opts = models.map(m => `<option>${m}</option>`).join('');
    $('modelA').innerHTML = opts;
    $('modelB').innerHTML = opts;
    if (models.length > 1) $('modelB').selectedIndex = 1;
    $('modelA').onchange = loadSets;
    $('modelB').onchange = loadSets;
    $('imageSel').onchange = compare;
    $('thresh').onchange = compare;
    if (models.length) loadSets();
  })();
})();
