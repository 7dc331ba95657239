#!/usr/bin/env python3
"""Generates the committed binary PPM fixtures + independently-computed
expected feature values (width/height/channel means/integer-exact aHash)
for MultimodalSpec. Driver-side tooling only - not part of the library.
Re-run: python3 tools/gen_multimodal_fixtures.py (output is deterministic)."""
import json, os, struct

OUT = "/root/repo/src/test/resources/multimodal"

def ppm(w, h, px):  # px: list of (r,g,b) row-major
    hdr = f"P6\n{w} {h}\n255\n".encode()
    return hdr + bytes(v for p in px for v in p)

def gen(name, w, h, f):
    px = [f(x, y) for y in range(h) for x in range(w)]
    data = ppm(w, h, px)
    open(f"{OUT}/{name}.ppm", "wb").write(data)
    return (name, w, h, px)

# deterministic patterns, dims divisible by 8
imgs = [
    gen("gradient", 16, 16, lambda x, y: (x * 16, y * 16, (x + y) * 8)),
    gen("checker", 16, 16, lambda x, y: ((255, 255, 255) if (x // 2 + y // 2) % 2 == 0 else (0, 0, 0))),
    # near-duplicate of checker: 3 pixels flipped
    gen("checker_neardup", 16, 16, lambda x, y: ((128, 128, 128) if (x, y) in {(0, 0), (7, 3), (15, 15)}
        else ((255, 255, 255) if (x // 2 + y // 2) % 2 == 0 else (0, 0, 0)))),
    gen("stripes", 32, 32, lambda x, y: ((255, 0, 0) if y % 4 < 2 else (0, 0, 255))),
    gen("solid", 8, 8, lambda x, y: (77, 150, 33)),
]

# independent aHash: integer-exact. luma_m = 299r+587g+114b per pixel;
# 8x8 block grid (dims divisible by 8); bit b set iff blockSum*64 > totalSum
def ahash(w, h, px):
    lum = [299 * r + 587 * g + 114 * b for (r, g, b) in px]
    total = sum(lum)
    bw, bh = w // 8, h // 8
    sig = 0
    for by in range(8):
        for bx in range(8):
            s = sum(lum[(by * bh + yy) * w + bx * bw + xx] for yy in range(bh) for xx in range(bw))
            if s * 64 > total:
                sig |= 1 << (by * 8 + bx)
    return sig

expected = {}
for (name, w, h, px) in imgs:
    lum = [299 * r + 587 * g + 114 * b for (r, g, b) in px]
    expected[name] = {
        "width": w, "height": h,
        "mean_r": sum(p[0] for p in px) // len(px),
        "mean_g": sum(p[1] for p in px) // len(px),
        "mean_b": sum(p[2] for p in px) // len(px),
        "ahash": ahash(w, h, px),
    }
json.dump(expected, open(f"{OUT}/expected.json", "w"), indent=1)
print(json.dumps(expected, indent=1))

def blob(cx, cy):
    def f(x, y):
        d2 = (x - cx) ** 2 + (y - cy) ** 2
        return (230, 220, 210) if d2 <= 25 else (20, 25, 30)
    return f

imgs2 = [gen("blob", 16, 16, blob(7, 7)), gen("blob_shift", 16, 16, blob(8, 7))]
for (name, w, h, px) in imgs2:
    expected[name] = {
        "width": w, "height": h,
        "mean_r": sum(p[0] for p in px) // len(px),
        "mean_g": sum(p[1] for p in px) // len(px),
        "mean_b": sum(p[2] for p in px) // len(px),
        "ahash": ahash(w, h, px),
    }
json.dump(expected, open(f"{OUT}/expected.json", "w"), indent=1)
h1, h2 = expected["blob"]["ahash"], expected["blob_shift"]["ahash"]
print("blob", h1, "blob_shift", h2, "hamming", bin(h1 ^ h2).count("1"))

# independent box-resize expectations: floor boundaries, floor channel mean
def resize(w, h, px, ow, oh):
    out = []
    for oy in range(oh):
        y0, y1 = oy * h // oh, (oy + 1) * h // oh
        for ox in range(ow):
            x0, x1 = ox * w // ow, (ox + 1) * w // ow
            cnt = (y1 - y0) * (x1 - x0)
            sums = [0, 0, 0]
            for y in range(y0, y1):
                for x in range(x0, x1):
                    for c in range(3):
                        sums[c] += px[y * w + x][c]
            out.extend(v // cnt for v in sums)
    return out

allimgs = {name: (w, h, px) for (name, w, h, px) in imgs + imgs2}
exp_resize = {}
for name, (ow, oh) in [("gradient", (8, 8)), ("stripes", (8, 8)), ("blob", (4, 4))]:
    w, h, px = allimgs[name]
    exp_resize[f"{name}_{ow}x{oh}"] = resize(w, h, px, ow, oh)
json.dump(exp_resize, open(f"{OUT}/expected_resize.json", "w"))
print("resize keys:", list(exp_resize.keys()))
