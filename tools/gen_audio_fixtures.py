#!/usr/bin/env python3
"""Generates the committed binary WAV (8-bit mono PCM) fixtures +
independently-computed expected feature values for MultimodalSpec's audio
differential. Driver-side tooling only - not part of the library.
Re-run: python3 tools/gen_audio_fixtures.py (output is deterministic)."""
import json, math, struct

OUT = "/root/repo/src/test/resources/multimodal"

def wav8(sample_rate, samples):  # samples: list of ints 0..255
    data = bytes(samples)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                   sample_rate, 1, 8)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data

def gen(name, sr, samples):
    open(f"{OUT}/{name}.wav", "wb").write(wav8(sr, samples))
    return (name, sr, samples)

def sine(n, period, amp=100, mid=128):
    return [min(255, max(0, mid + round(amp * math.sin(2 * math.pi * i / period))))
            for i in range(n)]

auds = [
    gen("sine", 8000, sine(256, 32)),
    gen("square", 8000, [28 if (i // 16) % 2 == 0 else 228 for i in range(256)]),
    gen("ramp", 11025, [i % 256 for i in range(512)]),
    gen("silence", 8000, [128] * 64),
]

def feats(sr, s):
    n = len(s)
    mean_amp = sum(s) // n
    peak = max(s)
    rms_sq = sum((v - 128) ** 2 for v in s) // n
    crossings = sum(1 for i in range(n - 1)
                    if (s[i] < 128) != (s[i + 1] < 128))
    return {"sample_rate": sr, "n_samples": n, "mean_amp": mean_amp,
            "peak": peak, "rms_sq": rms_sq, "crossings": crossings}

expected = {name: feats(sr, s) for (name, sr, s) in auds}
json.dump(expected, open(f"{OUT}/expected_audio.json", "w"), indent=1)
print(json.dumps(expected))
