"""Multimodal codec lanes: the fake lane is always-on (oracle-checked
via the image_features_fake registry query); the REAL decode lane
activates when PIL is importable — skip-marked here because this
container ships no image libraries."""

import pytest

from faxe_spark.operators import multimodal as mm
from faxe_spark.tables import load_table

SF = "/root/testdata/sf0.001"

_HAS_PIL = mm._image_codec() is not None


def test_fake_lane_deterministic(spark):
    d = load_table(spark, SF, "documents").limit(20)
    payload = mm.attach_binary(d, "text")
    a = mm.decode_image_features(payload, fake=True).collect()
    b = mm.decode_image_features(payload, fake=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(1 <= r.width <= 1920 and 1 <= r.height <= 1080 for r in a)


def test_real_lane_raises_without_pil(spark):
    if _HAS_PIL:
        pytest.skip("PIL installed: the raise path is unreachable")
    d = load_table(spark, SF, "documents").limit(2)
    payload = mm.attach_binary(d, "text")
    with pytest.raises(Exception, match="PIL"):
        mm.decode_image_features(payload, fake=False).collect()


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in container")
def test_real_lane_decodes_png(spark):
    """Live decode where Pillow exists: a generated 8x4 PNG round-trips
    with exact dimensions and a sane mean intensity."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 4), (255, 255, 255)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, payload binary")
    row = mm.decode_image_features(df, fake=False).collect()[0]
    assert (row.width, row.height) == (8, 4)
    assert row.mean_intensity == pytest.approx(1.0, abs=0.02)
