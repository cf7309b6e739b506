"""Native C++ ingest runtime vs the PIL reference loader."""

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.data import native_ingest
from anime_illust_image_searcher_tpu.data.ingest import load_rgb_square

pytestmark = pytest.mark.skipif(
    not native_ingest.available(), reason="native ingest runtime not built/available"
)


def save(tmp_path, name, arr, mode="RGB"):
    p = str(tmp_path / name)
    Image.fromarray(arr, mode).save(p)
    return p


def test_decode_jpeg_bitexact_vs_pil(tmp_path, rng):
    arr = rng.randint(0, 255, (90, 70, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    native = native_ingest.decode_resize(p, 64, pad_to_square=True, bilinear=False)
    pil = load_rgb_square(p, 64, pad_to_square=True)
    assert native is not None
    # same decode lib underneath, and the C++ replicates Pillow's fixed-point
    # Resample.c + paste-mask blend exactly: full decode is bit-identical
    np.testing.assert_array_equal(native, pil)


def _mode_images(rng):
    """One image per PIL mode family the native decoder accepts."""
    out = {}
    out["rgb.jpg"] = (Image.fromarray(rng.randint(0, 255, (101, 67, 3), np.uint8)),
                      dict(quality=92))
    out["gray.jpg"] = (Image.fromarray(rng.randint(0, 255, (80, 120), np.uint8), "L"),
                       dict(quality=90))
    out["rgb.png"] = (Image.fromarray(rng.randint(0, 255, (60, 100, 3), np.uint8)), {})
    rgba = rng.randint(0, 256, (64, 100, 4), np.uint8)
    rgba[0, :, 3] = 255  # fully-opaque row: the blend's boundary case
    rgba[1, :, 3] = 0    # fully-transparent row
    out["rgba.png"] = (Image.fromarray(rgba, "RGBA"), {})
    out["la.png"] = (Image.fromarray(rng.randint(0, 255, (50, 70, 2), np.uint8), "LA"),
                     {})
    out["pal.png"] = (Image.fromarray(
        rng.randint(0, 255, (40, 44, 3), np.uint8)).convert("P"), {})
    # P + tRNS: PIL drops the transparency in convert("RGB"); native must too
    out["paltrns.png"] = (Image.fromarray(
        rng.randint(0, 255, (40, 44, 3), np.uint8)).convert("P"),
        dict(transparency=5))
    out["gray.png"] = (Image.fromarray(rng.randint(0, 255, (90, 45), np.uint8), "L"),
                       {})
    # Adam7: the fast parser declines interlace, so this pins the libpng path
    out["interlaced.png"] = (Image.fromarray(
        rng.randint(0, 255, (47, 61, 3), np.uint8)), dict(interlace=True))
    return out


@pytest.mark.parametrize("size,pad,bilinear", [
    (448, True, False),   # tagger path (pad + bicubic)
    (64, True, False),
    (384, False, True),   # CCIP path (no pad + bilinear)
    (600, True, True),    # upscale
])
def test_bitexact_vs_pil_all_modes(tmp_path, rng, size, pad, bilinear):
    resample = Image.BILINEAR if bilinear else Image.BICUBIC
    for name, (img, kw) in _mode_images(rng).items():
        p = str(tmp_path / name)
        img.save(p, **kw)
        native = native_ingest.decode_resize(p, size, pad_to_square=pad,
                                             bilinear=bilinear)
        pil = load_rgb_square(p, size, resample=resample, pad_to_square=pad)
        assert native is not None, name
        np.testing.assert_array_equal(native, pil, err_msg=name)


def test_identity_size_bitexact(tmp_path, rng):
    """Canvas == target: PIL's resize degenerates to a copy; so must ours."""
    arr = rng.randint(0, 255, (64, 40, 3), dtype=np.uint8)
    p = save(tmp_path, "id.png", arr)
    native = native_ingest.decode_resize(p, 64, pad_to_square=True, bilinear=False)
    pil = load_rgb_square(p, 64, pad_to_square=True)
    np.testing.assert_array_equal(native, pil)


def test_bitexact_fuzz_random_geometry(tmp_path, rng):
    """Seeded differential fuzz: random sizes/modes/targets, native == PIL
    bit-for-bit (incl. 1-pixel images and extreme aspect ratios)."""
    for trial in range(30):
        w = int(rng.randint(1, 160))
        h = int(rng.randint(1, 160))
        mode_pick = trial % 6
        if mode_pick == 0:
            img = Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8))
            name, kw = f"f{trial}.jpg", dict(quality=int(rng.randint(60, 99)))
        elif mode_pick == 1:
            img = Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8))
            name, kw = f"f{trial}.png", {}
        elif mode_pick == 2:
            img = Image.fromarray(rng.randint(0, 256, (h, w, 4), np.uint8), "RGBA")
            name, kw = f"f{trial}.png", {}
        elif mode_pick == 3:
            img = Image.fromarray(rng.randint(0, 256, (h, w), np.uint8), "L")
            name, kw = f"f{trial}.png", {}
        elif mode_pick == 4:
            img = Image.fromarray(
                rng.randint(0, 256, (h, w, 2), np.uint8), "LA")
            name, kw = f"f{trial}.png", {}
        else:
            img = Image.fromarray(
                rng.randint(0, 256, (h, w, 3), np.uint8)).convert(
                    "P", palette=Image.ADAPTIVE)
            name, kw = f"f{trial}.png", {}
        p = str(tmp_path / name)
        img.save(p, **kw)
        size = int(rng.randint(8, 512))
        pad = bool(rng.randint(2))
        bil = bool(rng.randint(2))
        native = native_ingest.decode_resize(p, size, pad_to_square=pad,
                                             bilinear=bil)
        pil = load_rgb_square(p, size,
                              resample=Image.BILINEAR if bil else Image.BICUBIC,
                              pad_to_square=pad)
        assert native is not None
        np.testing.assert_array_equal(
            native, pil,
            err_msg=f"trial={trial} {w}x{h} size={size} pad={pad} bil={bil}")


def test_16bit_gray_png_declined(tmp_path, rng):
    """PIL maps 16-bit gray PNG to mode I and convert(RGB) CLAMPS to 255 — a
    quirk the native path declines rather than replicates (PIL fallback)."""
    arr = rng.randint(0, 65535, (30, 40), np.uint16)
    p = str(tmp_path / "g16.png")
    Image.fromarray(arr, "I;16").save(p)
    assert native_ingest.decode_resize(p, 32) is None
    assert load_rgb_square(p, 32) is not None  # the fallback handles it


def test_decode_png_rgba_white_flatten(tmp_path):
    # fully transparent pixels must become white (tagging.py:103-106 semantics)
    arr = np.zeros((20, 20, 4), dtype=np.uint8)
    arr[..., 0] = 200
    arr[..., 3] = 0  # fully transparent
    p = save(tmp_path, "t.png", arr, "RGBA")
    native = native_ingest.decode_resize(p, 20, pad_to_square=True, bilinear=True)
    assert native is not None
    assert np.all(native > 250)  # white


def test_pad_to_square_centers(tmp_path):
    # tall black image on white canvas: left/right bands must be white
    arr = np.zeros((64, 16, 3), dtype=np.uint8)
    p = save(tmp_path, "tall.png", arr)
    native = native_ingest.decode_resize(p, 64, pad_to_square=True, bilinear=True)
    assert np.all(native[:, :20] > 250)    # left white band
    assert np.all(native[:, -20:] > 250)   # right white band
    assert np.all(native[:, 28:36] < 5)    # black center


def test_bad_file_returns_none(tmp_path):
    p = str(tmp_path / "junk.png")
    with open(p, "wb") as f:
        f.write(b"this is not an image")
    assert native_ingest.decode_resize(p, 32) is None


def test_batch_decoder(tmp_path, rng):
    paths = []
    for i in range(5):
        arr = rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
        paths.append(save(tmp_path, f"b{i}.png", arr))
    paths.append(str(tmp_path / "missing.png"))
    dec = native_ingest.NativeBatchDecoder(workers=4)
    try:
        imgs, ok = dec.decode_batch(paths, 32)
        assert imgs.shape == (6, 32, 32, 3)
        assert ok.tolist() == [True] * 5 + [False]
        # each decoded image matches the single-shot API
        single = native_ingest.decode_resize(paths[0], 32)
        np.testing.assert_array_equal(imgs[0], single)
    finally:
        dec.close()


def test_matches_pil_bilinear_no_pad(tmp_path, rng):
    arr = rng.randint(0, 255, (50, 50, 3), dtype=np.uint8)
    p = save(tmp_path, "c.png", arr)
    native = native_ingest.decode_resize(p, 32, pad_to_square=False, bilinear=True)
    pil = np.asarray(
        Image.fromarray(arr).resize((32, 32), resample=Image.BILINEAR), np.uint8
    )
    np.testing.assert_array_equal(native, pil)


def test_scaled_decode_close_to_full(tmp_path):
    """libjpeg DCT-domain scaled decode (AIIS_SCALED_DECODE / scaled=True) must
    approximate the full decode+resize closely on smooth content, and fall back
    to full decode for images already near the target size."""
    rng2 = np.random.RandomState(3)
    yy, xx = np.mgrid[0:1200, 0:900].astype(np.float32)
    smooth = np.stack([
        127 + 100 * np.sin(xx / 40), 127 + 100 * np.cos(yy / 50),
        127 + 100 * np.sin((xx + yy) / 70),
    ], axis=-1)
    smooth = np.clip(smooth + rng2.randn(1200, 900, 3) * 4, 0, 255).astype(np.uint8)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(smooth).save(p, quality=92)

    full = native_ingest.decode_resize(p, 224, scaled=False)
    fast = native_ingest.decode_resize(p, 224, scaled=True)
    d = np.abs(full.astype(np.int16) - fast.astype(np.int16))
    assert d.mean() < 2.0, d.mean()

    # small image: the chosen scale is 8/8 -> bit-identical to full decode
    small = np.clip(smooth[:200, :150], 0, 255)
    ps = str(tmp_path / "small.jpg")
    Image.fromarray(small).save(ps, quality=92)
    np.testing.assert_array_equal(
        native_ingest.decode_resize(ps, 224, scaled=False),
        native_ingest.decode_resize(ps, 224, scaled=True))


def test_stale_abi_so_is_refused(tmp_path, monkeypatch):
    """A .so predating a C-ABI change (no/old aiis_abi_version) must never be
    called through the new signatures: get_lib rebuilds, and if the artifact
    still mismatches it disables the native path instead of corrupting memory."""
    import subprocess
    import sys

    src = tmp_path / "dummy.c"
    src.write_text("int something_else(void) { return 0; }\n")
    so = tmp_path / "libdummy.so"
    subprocess.run(["g++", "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)
    monkeypatch.setattr(native_ingest, "_lib", None)
    monkeypatch.setattr(native_ingest, "_load_failed", False)
    monkeypatch.setattr(native_ingest, "_SO_PATH", str(so))
    # _build() writes to the real path, not our dummy, so the "rebuilt" file
    # still lacks the symbol -> must refuse, not call through
    assert native_ingest.get_lib() is None
    assert native_ingest._load_failed


def test_corrupt_plte_rejected_like_pil(tmp_path, rng):
    """A bit-flipped PLTE byte must FAIL native decode (CRC check), matching
    PIL's rejection — never silently decode wrong colors (decline→fallback
    contract; see the CRC note in runtime/ingest.cpp)."""
    p = str(tmp_path / "pal.png")
    Image.fromarray(rng.randint(0, 256, (24, 24, 3), np.uint8)).convert("P").save(p)
    data = bytearray(open(p, "rb").read())
    i = data.find(b"PLTE")
    assert i > 0
    data[i + 10] ^= 0xFF  # corrupt a palette byte, leave the stored CRC stale
    open(p, "wb").write(bytes(data))
    assert native_ingest.decode_resize(p, 32) is None
    assert load_rgb_square(p, 32) is None  # PIL rejects it too


def test_chunk_before_ihdr_declines_to_pil(tmp_path, rng):
    """A crafted PNG whose first chunk is not IHDR must DECLINE native decode
    (the fast chunk parser requires IHDR first, and libpng also rejects the
    ordering) — the fast path must never be LAXER than libpng on malformed
    files. PIL happens to tolerate this ordering, so the decline→PIL-fallback
    contract still serves the file with the correct pixels."""
    p = str(tmp_path / "ok.png")
    Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).save(p)
    want = load_rgb_square(p, 32)
    raw = open(p, "rb").read()
    sig, rest = raw[:8], raw[8:]
    ihdr_len = 12 + int.from_bytes(rest[:4], "big")
    ihdr, tail = rest[:ihdr_len], rest[ihdr_len:]
    # a valid ancillary chunk (zero-length, correct CRC) ahead of IHDR
    import zlib
    body = b"eXIf"
    bogus = (0).to_bytes(4, "big") + body + zlib.crc32(body).to_bytes(4, "big")
    bad = str(tmp_path / "bad_order.png")
    open(bad, "wb").write(sig + bogus + ihdr + tail)
    assert native_ingest.decode_resize(bad, 32) is None  # native declines
    got = load_rgb_square(bad, 32)  # full loader: PIL fallback serves it
    np.testing.assert_array_equal(got, want)


def _png_chunks(raw):
    """Split a PNG byte string into (signature, [whole chunk bytes])."""
    sig, rest = raw[:8], raw[8:]
    chunks, off = [], 0
    while off < len(rest):
        ln = int.from_bytes(rest[off:off + 4], "big")
        chunks.append(rest[off:off + 12 + ln])
        off += 12 + ln
    return sig, chunks


def _png_chunk(ctype, body):
    import zlib

    return (len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big"))


def test_gapped_idat_rejected_like_pil(tmp_path, rng):
    """IDAT chunks interrupted by another chunk: libpng errors ("Not enough
    image data") and PIL errors ("image file is truncated") because both stop
    consuming image data at the gap — so the fast parser, which concatenates
    ALL IDAT chunks, must reject the gap rather than decode a file the rest
    of the stack refuses (it did once; this is the regression pin)."""
    p = str(tmp_path / "ok.png")
    Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).save(p)
    sig, chunks = _png_chunks(open(p, "rb").read())
    types = [c[4:8] for c in chunks]
    i = types.index(b"IDAT")
    body = chunks[i][8:-4]
    assert len(body) > 2
    gapped = (chunks[:i]
              + [_png_chunk(b"IDAT", body[:len(body) // 2]),
                 _png_chunk(b"eXIf", b""),
                 _png_chunk(b"IDAT", body[len(body) // 2:])]
              + chunks[i + 1:])
    bad = str(tmp_path / "gapped.png")
    open(bad, "wb").write(sig + b"".join(gapped))
    assert native_ingest.decode_resize(bad, 32) is None
    assert load_rgb_square(bad, 32) is None  # PIL refuses it too


@pytest.mark.parametrize("placement", ["duplicate", "after_idat"])
def test_out_of_place_plte_declines_to_pil(tmp_path, rng, placement):
    """A duplicate PLTE, or PLTE after IDAT, hard-errors in libpng
    ("PLTE: duplicate" / "Missing PLTE before IDAT") — the fast parser must
    reject both orderings too (never be laxer than libpng). PIL tolerates
    them (its chunk scan stops at IDAT, so a LATE palette is simply never
    applied and those pixels come out through the default black palette) —
    the decline→PIL-fallback contract is that the loader serves exactly
    what PIL decodes for the file, whatever that is."""
    p = str(tmp_path / "pal.png")
    im = Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).convert("P")
    im.save(p)
    sig, chunks = _png_chunks(open(p, "rb").read())
    types = [c[4:8] for c in chunks]
    pi, ii = types.index(b"PLTE"), types.index(b"IDAT")
    if placement == "duplicate":
        reordered = chunks[:pi + 1] + [chunks[pi]] + chunks[pi + 1:]
    else:
        reordered = (chunks[:pi] + chunks[pi + 1:ii]
                     + [chunks[ii], chunks[pi]] + chunks[ii + 1:])
    bad = str(tmp_path / "plte.png")
    open(bad, "wb").write(sig + b"".join(reordered))
    assert native_ingest.decode_resize(bad, 32) is None  # native declines
    got = load_rgb_square(bad, 32)  # PIL fallback serves it
    assert got is not None
    if placement == "duplicate":
        # the duplicated palette is identical, so PIL's pixels are unchanged
        np.testing.assert_array_equal(got, load_rgb_square(p, 32))


def test_corrupt_iend_crc_decodes_like_the_rest_of_the_stack(tmp_path, rng):
    """A bit-flipped IEND CRC: libpng never reads IEND on this decode path
    (the image is complete after the last IDAT row) and PIL tolerates it, so
    the file decodes everywhere. The fast parser DOES consume IEND (it
    terminates the parse), so per the consumed-chunk-CRC policy it declines
    to libpng — pixels must come out identical to PIL's either way."""
    p = str(tmp_path / "ok.png")
    Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).save(p)
    want = load_rgb_square(p, 32)
    data = bytearray(open(p, "rb").read())
    assert data[-12:-8] == b"\x00\x00\x00\x00" and data[-8:-4] == b"IEND"
    data[-1] ^= 0xFF
    bad = str(tmp_path / "iend.png")
    open(bad, "wb").write(bytes(data))
    got_native = native_ingest.decode_resize(bad, 32)
    assert got_native is not None  # libpng path serves it
    np.testing.assert_array_equal(got_native, want)


def test_multi_idat_consecutive_still_fast_and_bitexact(tmp_path, rng):
    """Splitting a valid IDAT stream into several CONSECUTIVE chunks is legal
    PNG (encoders emit ~8-64 KiB IDATs routinely) — the fast parser must
    concatenate them and decode bit-identically to PIL, and the gap check
    added for out-of-order IDAT runs must NOT reject adjacency."""
    p = str(tmp_path / "ok.png")
    Image.fromarray(rng.randint(0, 256, (48, 40, 3), np.uint8)).save(p)
    want = load_rgb_square(p, 32)
    sig, chunks = _png_chunks(open(p, "rb").read())
    types = [c[4:8] for c in chunks]
    i = types.index(b"IDAT")
    body = chunks[i][8:-4]
    assert len(body) >= 9
    third = len(body) // 3
    parts = [_png_chunk(b"IDAT", body[j * third:(j + 1) * third if j < 2 else len(body)])
             for j in range(3)]
    multi = str(tmp_path / "multi.png")
    open(multi, "wb").write(sig + b"".join(chunks[:i] + parts + chunks[i + 1:]))
    got = native_ingest.decode_resize(multi, 32)
    assert got is not None  # fast path (or libpng) serves it natively
    np.testing.assert_array_equal(got, want)


def test_corruption_differential_fuzz(tmp_path, rng):
    """Adversarial decode fuzz over the WHOLE chain (fast PNG -> libpng ->
    PIL fallback): for ANY input bytes — a valid file with random byte flips,
    or a random-point truncation — the native-enabled loader must agree with
    the pure-PIL loader bit-for-bit, or both must skip (None). This is the
    contract decode_rgb_square and the batch producer rely on: the native
    layer may only ever ACCELERATE the PIL answer, never change it
    (reference skip semantics tagging.py:245-252)."""
    from anime_illust_image_searcher_tpu.data.ingest import decode_rgb_square

    bases = {
        "rgb.png": Image.fromarray(rng.randint(0, 256, (40, 56, 3), np.uint8)),
        "rgba.png": Image.fromarray(rng.randint(0, 256, (32, 48, 4), np.uint8),
                                    "RGBA"),
        "gray.png": Image.fromarray(rng.randint(0, 256, (45, 33), np.uint8), "L"),
        "la.png": Image.fromarray(rng.randint(0, 256, (30, 30, 2), np.uint8), "LA"),
        "pal.png": Image.fromarray(
            rng.randint(0, 256, (36, 36, 3), np.uint8)).convert(
                "P", palette=Image.ADAPTIVE),
        "rgb.jpg": Image.fromarray(rng.randint(0, 256, (40, 56, 3), np.uint8)),
        "prog.jpg": Image.fromarray(rng.randint(0, 256, (40, 56, 3), np.uint8)),
    }
    save_kw = {"rgb.jpg": dict(quality=90),
               "prog.jpg": dict(quality=85, progressive=True)}
    for name, img in bases.items():
        clean = tmp_path / name
        img.save(str(clean), **save_kw.get(name, {}))
        data = bytearray(open(str(clean), "rb").read())
        for trial in range(25):
            mutated = bytearray(data)
            if trial % 5 == 4:
                cut = int(rng.randint(1, len(mutated)))
                mutated = mutated[:cut]
                desc = f"truncate@{cut}"
            else:
                nflips = int(rng.randint(1, 5))
                offs = [int(o) for o in rng.randint(0, len(mutated), size=nflips)]
                for o in offs:
                    mutated[o] ^= int(rng.randint(1, 256))
                desc = f"flip@{offs}"
            p = str(tmp_path / ("mut_" + name))
            open(p, "wb").write(bytes(mutated))
            native = decode_rgb_square(p, 48)
            pil = load_rgb_square(p, 48)
            if pil is None:
                assert native is None, (
                    f"{name} {desc}: native decoded where PIL skips")
            else:
                assert native is not None, (
                    f"{name} {desc}: native skipped where PIL decodes")
                np.testing.assert_array_equal(native, pil,
                                              err_msg=f"{name} {desc}")


def test_pre_idat_corrupt_ancillary_crc_rejected_like_pil(tmp_path, rng):
    """Pillow rejects a file whose pre-IDAT chunks carry a bad CRC — even
    ancillary ones it merely walks (tRNS, pHYs, tEXt, unknown) — while plain
    libpng only warns and discards. Found by the corruption differential
    fuzz on a P+tRNS image: the native stack must skip exactly like PIL
    (ancillary CRC errors hard-fail -> decline -> PIL rejects)."""
    from anime_illust_image_searcher_tpu.data.ingest import decode_rgb_square

    img = Image.fromarray(rng.randint(0, 256, (24, 24, 3), np.uint8)).convert("P")
    p = str(tmp_path / "t.png")
    img.save(p, transparency=5)
    sig, chunks = _png_chunks(open(p, "rb").read())
    types = [c[4:8] for c in chunks]
    i = types.index(b"tRNS")
    bad = bytearray(chunks[i]); bad[-1] ^= 0xFF
    pbad = str(tmp_path / "bad_trns.png")
    open(pbad, "wb").write(sig + b"".join(
        chunks[:i] + [bytes(bad)] + chunks[i + 1:]))
    assert load_rgb_square(pbad, 32) is None          # PIL rejects
    assert native_ingest.decode_resize(pbad, 32) is None  # so must native
    assert decode_rgb_square(pbad, 32) is None        # and the whole chain


def test_post_idat_corrupt_ancillary_decodes_like_pil(tmp_path, rng):
    """Pillow IGNORES CRCs after the image data (its load() never verifies
    post-IDAT chunks) — a corrupt tEXt chunk after IDAT must therefore still
    decode, bit-identically, through the native stack (the fast parser
    declines on any bad CRC it walks; the libpng path never reads past the
    last IDAT row and serves it)."""
    p = str(tmp_path / "ok.png")
    Image.fromarray(rng.randint(0, 256, (20, 28, 3), np.uint8)).save(p)
    want = load_rgb_square(p, 32)
    sig, chunks = _png_chunks(open(p, "rb").read())
    types = [c[4:8] for c in chunks]
    i = types.index(b"IDAT")
    bad = bytearray(_png_chunk(b"tEXt", b"k\x00v")); bad[-1] ^= 0xFF
    pbad = str(tmp_path / "bad_text.png")
    open(pbad, "wb").write(sig + b"".join(
        chunks[:i + 1] + [bytes(bad)] + chunks[i + 1:]))
    assert load_rgb_square(pbad, 32) is not None      # PIL tolerates
    got = native_ingest.decode_resize(pbad, 32)
    assert got is not None                            # so must native
    np.testing.assert_array_equal(got, want)


def test_incomplete_progressive_declines_to_pil(tmp_path, rng):
    """A mid-stream EOI (one corrupted SOS marker byte) legally ends a
    progressive JPEG before its scan script completes; libjpeg and Pillow
    both render the partial coefficients but their partial-progressive
    paths differ by a couple of LSBs (found by the corruption fuzz). The
    native decoder detects the incomplete progression via coef_bits and
    declines, so PIL stays the arbiter; COMPLETE progressive files keep
    the native bit-exact fast path."""
    from anime_illust_image_searcher_tpu.data.ingest import decode_rgb_square

    p = str(tmp_path / "prog.jpg")
    Image.fromarray(rng.randint(0, 256, (64, 80, 3), np.uint8)).save(
        p, quality=85, progressive=True)
    want = load_rgb_square(p, 48)
    got = native_ingest.decode_resize(p, 48)
    assert got is not None  # complete progressive: native serves it
    np.testing.assert_array_equal(got, want)

    data = bytearray(open(p, "rb").read())
    sos = [i for i in range(2, len(data) - 1)
           if data[i] == 0xFF and data[i + 1] == 0xDA]
    assert len(sos) >= 3  # progressive: many scans
    data[sos[len(sos) // 2] + 1] = 0xD9  # middle SOS -> premature EOI
    pbad = str(tmp_path / "eoi.jpg")
    open(pbad, "wb").write(bytes(data))
    pil = load_rgb_square(pbad, 48)
    assert pil is not None  # Pillow renders the partial progression
    assert native_ingest.decode_resize(pbad, 48) is None  # native declines
    chain = decode_rgb_square(pbad, 48)
    np.testing.assert_array_equal(chain, pil)  # chain serves PIL's pixels


def test_exotic_valid_png_variants_bitexact(tmp_path, rng):
    """Sub-8-bit and 16-bit PNGs take the libpng path (the fast parser only
    handles 8-bit): 1-bit gray (expand_gray_1_2_4_to_8), 4-bit palette, and
    16-bit RGB/RGBA (png_set_strip_16 keeping the high byte == PIL's ';16B'
    unpack) must all be bit-identical to the PIL loader."""
    import struct
    import zlib

    p1 = str(tmp_path / "g1.png")
    Image.fromarray((rng.randint(0, 2, (40, 40)) * 255).astype(np.uint8),
                    "L").convert("1").save(p1)
    p4 = str(tmp_path / "p4.png")
    Image.fromarray(rng.randint(0, 256, (30, 30, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE, colors=16).save(p4, bits=4)

    def png16(path, color_type, channels):
        h, w = 20, 24
        raw = rng.randint(0, 65536, (h, w, channels)).astype(">u2")
        rows = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
        blob = (b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR",
                             struct.pack(">IIBBBBB", w, h, 16, color_type,
                                         0, 0, 0))
                + _png_chunk(b"IDAT", zlib.compress(rows))
                + _png_chunk(b"IEND", b""))
        open(path, "wb").write(blob)

    p16 = str(tmp_path / "rgb16.png"); png16(p16, 2, 3)
    p16a = str(tmp_path / "rgba16.png"); png16(p16a, 6, 4)
    for p in (p1, p4, p16, p16a):
        pil = load_rgb_square(p, 64)
        nat = native_ingest.decode_resize(p, 64)
        assert pil is not None and nat is not None, p
        np.testing.assert_array_equal(nat, pil, err_msg=p)
