"""probe_geometry.py CLI: end-to-end smoke on a saved checkpoint.

The classifier logic it implements (billboard / fog / geometry) is pinned
against real trained checkpoints in docs/TRAINING_RUN.md; here we verify
the CLI wiring — config -> option tree -> checkpoint restore -> probe
render -> stats + verdict — on a fresh init with tiny probe shapes.
"""

import jax

import probe_geometry
from sdface_gan_tpu.config import load_config
from sdface_gan_tpu.config.build import generator_config
from sdface_gan_tpu.config.sdf_options import get_vol_render_opt, rendering_overrides
from sdface_gan_tpu.config.yaml_config import default_config_path
from sdface_gan_tpu.models.generator import init_generator
from sdface_gan_tpu.utils.checkpoints import save_checkpoint

CONFIG = """\
method: sdf
data:
  path: data/none
  fid_file: null
  img_size: 64
training:
  out_dir: out/test_probe
"""


def test_probe_geometry_cli(tmp_path, capsys):
    cfg_path = tmp_path / "probe.yaml"
    cfg_path.write_text(CONFIG)

    cfg = load_config(str(cfg_path), default_config_path())
    opt = get_vol_render_opt("test_probe", True, size=64,
                             extra_argv=rendering_overrides(cfg))
    gcfg = generator_config(opt, stage_a=True)
    params = init_generator(jax.random.PRNGKey(0), gcfg)
    vr_dir = str(tmp_path / "volume_renderer")
    save_checkpoint(vr_dir, "vol_renderer", {"g": params, "g_ema": params})

    probe_geometry.main([
        "--config", str(cfg_path), "--size", "64", "--stage", "a",
        "--res", "8", "--identities", "1", "--mesh", "--out", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "verdict:" in out
    assert "id0: sdf[" in out and "ray-crossing" in out and "occupancy" in out
