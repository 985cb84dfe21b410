// Mask / box IoU utilities for the viewer's det-comparison feature
// (fresh replacement for the reference's iou.js inspector).

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
