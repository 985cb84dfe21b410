// YOLACT-TPU detection viewer: loads web-json detection dumps
// (produced by --output_web_json) and renders boxes + RLE masks.

const COLORS = [
  [244, 67, 54], [233, 30, 99], [156, 39, 176], [103, 58, 183],
  [63, 81, 181], [33, 150, 243], [3, 169, 244], [0, 188, 212],
  [0, 150, 136], [76, 175, 80], [139, 195, 74], [205, 220, 57],
  [255, 235, 59], [255, 193, 7], [255, 152, 0], [255, 87, 34],
  [121, 85, 72], [158, 158, 158], [96, 125, 139]];

const state = { data: null, imageIdx: 0, selected: [] };

const $ = id => document.getElementById(id);

async function init() {
  const models = await (await fetch('/detindex')).json();
  const sel = $('modelSel');
  sel.innerHTML = models.map(m => `<option>${m}</option>`).join('');
  sel.onchange = loadModel;
  $('imageSel').onchange = () => { state.imageIdx = $('imageSel').selectedIndex; render(); };
  $('thresh').onchange = render;
  $('showMasks').onchange = render;
  $('showBoxes').onchange = render;
  if (models.length) loadModel();
}

async function loadModel() {
  const name = $('modelSel').value;
  state.data = await (await fetch(`dets/${name}.json`)).json();
  const sel = $('imageSel');
  sel.innerHTML = state.data.images
    .map(im => `<option>${im.image_id}</option>`).join('');
  state.imageIdx = 0;
  render();
}

function color(i) { const c = COLORS[(i * 5) % COLORS.length]; return c; }

async function render() {
  if (!state.data) return;
  const imgObj = state.data.images[state.imageIdx];
  const canvas = $('canvas');
  const ctx = canvas.getContext('2d');
  const thresh = parseFloat($('thresh').value);
  const dets = imgObj.dets.filter(d => d.score >= thresh);

  // generation guard: a slow earlier image load must not clobber a
  // newer render after the user switched images
  const gen = (state.renderGen = (state.renderGen || 0) + 1);
  const img = new Image();
  img.onload = () => {
    if (gen !== state.renderGen) return;  // stale load
    canvas.width = img.width; canvas.height = img.height;
    ctx.drawImage(img, 0, 0);
    draw(ctx, dets, img.width, img.height);
  };
  img.onerror = () => {
    if (gen !== state.renderGen) return;  // stale load
    // no image on disk: draw on a blank canvas sized from the first mask
    const size = dets.length ? dets[0].mask.size : [480, 640];
    canvas.height = size[0]; canvas.width = size[1];
    ctx.fillStyle = '#000';
    ctx.fillRect(0, 0, canvas.width, canvas.height);
    draw(ctx, dets, canvas.width, canvas.height);
  };
  img.src = `/image${imgObj.image_id}`;
  listDets(dets);
}

function draw(ctx, dets, W, H) {
  // one readback, all masks blended, one writeback (a per-detection
  // getImageData/putImageData pair is O(W*H) each and makes the
  // threshold slider visibly laggy on real images)
  if ($('showMasks').checked && dets.some(d => d.mask)) {
    const im = ctx.getImageData(0, 0, W, H);
    const a = 0.45;
    dets.forEach((d, i) => {
      if (!d.mask) return;
      const c = color(i);
      const m = rleToMask(d.mask);
      for (let y = 0; y < Math.min(m.h, H); y++)
        for (let x = 0; x < Math.min(m.w, W); x++)
          if (m.data[y * m.w + x]) {
            const o = (y * W + x) * 4;
            im.data[o] = im.data[o] * (1 - a) + c[0] * a;
            im.data[o + 1] = im.data[o + 1] * (1 - a) + c[1] * a;
            im.data[o + 2] = im.data[o + 2] * (1 - a) + c[2] * a;
          }
    });
    ctx.putImageData(im, 0, 0);
  }
  dets.forEach((d, i) => {
    const c = color(i);
    if ($('showBoxes').checked) {
      ctx.strokeStyle = `rgb(${c[0]},${c[1]},${c[2]})`;
      ctx.lineWidth = 2;
      ctx.strokeRect(d.bbox[0], d.bbox[1], d.bbox[2], d.bbox[3]);
      ctx.fillStyle = ctx.strokeStyle;
      ctx.font = '14px sans-serif';
      ctx.fillText(`${d.category} ${d.score.toFixed(2)}`,
                   d.bbox[0] + 2, Math.max(12, d.bbox[1] - 4));
    }
  });
}

function listDets(dets) {
  const div = $('dets');
  div.innerHTML = '';
  dets.forEach((d, i) => {
    const c = color(i);
    const el = document.createElement('span');
    el.className = 'det';
    el.style.borderLeft = `6px solid rgb(${c[0]},${c[1]},${c[2]})`;
    el.textContent = `${d.category} ${d.score.toFixed(2)}`;
    el.onclick = () => select(i, dets, el);
    div.appendChild(el);
  });
  state.selected = [];
}

function select(i, dets, el) {
  el.classList.toggle('active');
  const sel = state.selected;
  if (sel.includes(i)) sel.splice(sel.indexOf(i), 1); else sel.push(i);
  if (sel.length === 2) {
    const [a, b] = sel.map(j => dets[j]);
    const bi = boxIoU(a.bbox, b.bbox);
    const mi = (a.mask && b.mask) ?
      maskIoU(rleToMask(a.mask), rleToMask(b.mask)) : 0;
    $('ioubox').textContent =
      `box IoU = ${bi.toFixed(3)}   mask IoU = ${mi.toFixed(3)}`;
  }
}

init();
