"""warpback_demo CLI: the reference's hand-validation surface
(stage1/stage2 __main__ debug renders + moving_obj montage) must produce
readable artifacts from synthesized toydata."""
import os


def test_warpback_demo_writes_montages(tmp_path):
    from mpiflow_tpu.cli import warpback_demo
    rc = warpback_demo.main([
        "--out", str(tmp_path), "--num", "1",
        "--width", "128", "--height", "96", "--skip_object_motion"])
    assert rc == 0
    assert os.path.exists(tmp_path / "stage1_000.jpg")
    assert os.path.exists(tmp_path / "stage2_000.jpg")
    from PIL import Image
    img = Image.open(tmp_path / "stage1_000.jpg")
    assert img.size == (128 * 2, 96 * 3)
