// COCO compressed-RLE decoder (same varint format as our native codec).
// Returns a Uint8Array of h*w pixels in ROW-major order (decoded from the
// column-major RLE).
function decodeRleCounts(s) {
  const counts = [];
  let p = 0;
  while (p < s.length) {
    let x = 0, k = 0, more = true;
    while (more) {
      const c = s.charCodeAt(p) - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) !== 0;
      p++; k++;
      if (!more && (c & 0x10)) x |= -1 << (5 * k);
    }
    if (counts.length > 2) x += counts[counts.length - 2];
    counts.push(x >>> 0);
  }
  return counts;
}

function rleToMask(rle) {
  const [h, w] = rle.size;
  const counts = typeof rle.counts === 'string'
    ? decodeRleCounts(rle.counts) : rle.counts;
  const colMajor = new Uint8Array(h * w);
  let pos = 0, val = 0;
  for (const c of counts) {
    colMajor.fill(val, pos, Math.min(pos + c, h * w));
    pos += c; val = 1 - val;
    if (pos >= h * w) break;
  }
  // column-major -> row-major
  const mask = new Uint8Array(h * w);
  for (let x = 0; x < w; x++)
    for (let y = 0; y < h; y++)
      mask[y * w + x] = colMajor[x * h + y];
  return { data: mask, h, w };
}
