"""EAN-13 (core/barcode.py): second U3 symbology — encoder/decoder
round trip, checksum, damage rejection, and the kernel's bar-group
detection across page transformations (incl. the quarter-turn +
misled-deskew regression the pre-deskew orientation re-vote fixes)."""

import random

import numpy as np

from ocr_gpu_services_spark.core import barcode


def test_checksum_known_value():
    assert barcode.checksum("400638133393") == 1       # published example


def test_roundtrip_and_reverse_scan():
    rng = random.Random(0)
    for _ in range(50):
        d = "".join(rng.choice("0123456789") for _ in range(12))
        full = d + str(barcode.checksum(d))
        img = barcode.encode(d)
        assert barcode.try_decode_region(img) == full
        rev = np.ascontiguousarray(img[::-1, ::-1])
        assert barcode.try_decode_region(rev) == full


def test_garbage_and_damage_rejected():
    rs = np.random.RandomState(1)
    for _ in range(60):
        noise = rs.rand(40, 190) < rs.uniform(0.2, 0.8)
        img = np.where(noise, 0, 255).astype(np.uint8)
        assert barcode.try_decode_region(img) is None
    # single flipped module -> checksum/parity failure, never wrong data
    d = "501234567890"
    full = d + str(barcode.checksum(d))
    img = barcode.encode(d)
    rng = random.Random(2)
    for _ in range(25):
        m = rng.randrange(95)
        dam = img.copy()
        x = m * barcode.MODULE_W
        dam[:, x:x + barcode.MODULE_W] = \
            255 - dam[:, x:x + barcode.MODULE_W]
        assert barcode.try_decode_region(dam) in (None, full)


def test_wrong_checksum_rejected():
    d = "501234567890"
    mods = barcode.modules(d)
    # re-render with the last digit's pattern swapped to a digit whose
    # R-code differs -> checksum mismatch must reject
    bad = mods.copy()
    from ocr_gpu_services_spark.core.barcode import _R
    good_check = barcode.checksum(d)
    other = (good_check + 1) % 10
    pat = np.array([c == "1" for c in _R[other]])
    bad[85:92] = pat
    row = np.where(np.repeat(bad, barcode.MODULE_W), 0, 255) \
        .astype(np.uint8)
    img = np.tile(row, (barcode.BAR_H, 1))
    assert barcode.try_decode_region(img) is None


def test_kernel_detects_barcode_on_transformed_pages():
    from ocr_gpu_services_spark.core.extract import (extract_document,
                                                     get_atlas)
    from ocr_gpu_services_spark.core.png import png_encode
    from ocr_gpu_services_spark.fixtures import imagegen
    get_atlas()
    found = 0
    for i in range(160):
        rng = random.Random(i * 131)
        plan = imagegen.image_plan(rng, i)
        if plan["ean_payload"] is None:
            continue
        img = imagegen.render_image_page(plan)
        _ct, _text, spans, *_r, err = extract_document(png_encode(img),
                                                       None)
        want = plan["ean_payload"] + \
            str(barcode.checksum(plan["ean_payload"]))
        bc = [s for s in spans if s.kind == "barcode"]
        assert err is None and len(bc) == 1 and bc[0].text == want, \
            (i, plan, [s.text for s in bc])
        meta = imagegen.canonical_meta(plan)
        assert (bc[0].x0, bc[0].y0, bc[0].x1, bc[0].y1) == \
            meta["ean_span"], i
        found += 1
    assert found >= 15                  # the draw rate guarantees plenty


def test_quarter_turned_barcode_page_recovers():
    """Regression: a quarter-turned page whose barcode (a) presents a
    spurious glyph-height band and (b) misleads estimate_skew must
    still settle via the pre-deskew orientation re-vote."""
    from ocr_gpu_services_spark.core.extract import (extract_document,
                                                     get_atlas)
    from ocr_gpu_services_spark.core.png import png_encode
    from ocr_gpu_services_spark.fixtures import imagegen
    get_atlas()
    rng = random.Random(126 * 131)
    plan = imagegen.image_plan(rng, 126)
    assert plan["ean_payload"] is not None and plan["turn"] == 3
    up = dict(plan)
    up.update(turn=0, persp=None, bed=None)
    img_t = imagegen.render_image_page(plan)
    img_u = imagegen.render_image_page(up)
    r_t = extract_document(png_encode(img_t), None)
    r_u = extract_document(png_encode(img_u), None)
    assert r_t[1] == r_u[1]                        # text byte-identical
    assert [s.as_dict() for s in r_t[2]] == [s.as_dict() for s in r_u[2]]
