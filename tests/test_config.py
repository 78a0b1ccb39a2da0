import os

import pytest

from sdface_gan_tpu.config import (
    ConfigNode,
    load_config,
    get_vol_render_opt,
    parse_sdf_options,
)


def test_confignode_attr_access():
    c = ConfigNode(a=1, b={"c": 2})
    assert c.a == 1
    assert c.b.c == 2
    c.b.d = 3
    assert c["b"]["d"] == 3


def test_confignode_recursive_merge():
    base = ConfigNode(x={"a": 1, "b": 2}, y=5)
    out = base.merged_with({"x": {"b": 3}, "z": 7})
    assert out.x.a == 1 and out.x.b == 3 and out.y == 5 and out.z == 7
    # original untouched
    assert base.x.b == 2 and "z" not in base


def test_yaml_inherit_from(tmp_path):
    default = tmp_path / "default.yaml"
    default.write_text("method: giraffe\ntraining:\n  batch_size: 32\n  lr: 0.001\n")
    parent = tmp_path / "parent.yaml"
    parent.write_text("training:\n  batch_size: 8\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"inherit_from: {parent}\ntraining:\n  lr: 0.01\n")

    cfg = load_config(str(child), str(default))
    assert cfg.method == "giraffe"
    assert cfg.training.batch_size == 8
    assert cfg.training.lr == 0.01


def test_sdf_defaults_match_reference():
    opt = parse_sdf_options([])
    # Defaults from reference SDFOptions (sdf_utils.py:447-594)
    assert opt.training.batch == 4
    assert opt.training.r1 == 10.0
    assert opt.training.view_lambda == 15.0
    assert opt.training.eikonal_lambda == 0.1
    assert opt.training.min_surf_lambda == 0.05
    assert opt.training.d_reg_every == 16
    assert opt.training.g_reg_every == 4
    assert opt.training.mixing == 0.9
    assert opt.model.style_dim == 256
    assert opt.model.renderer_spatial_output_dim == 64
    assert opt.camera.fov == 6.0
    assert opt.camera.dist_radius == 0.12
    assert opt.rendering.N_samples == 24


def test_stage_option_derivation():
    a = get_vol_render_opt("exp", True, ngp=True)
    assert a.model.freeze_renderer is False
    assert a.rendering.no_features_output is True
    assert a.rendering.return_sdf is True  # min_surf_lambda > 0
    assert a.training.iter == 200001
    assert a.rendering.type == "ngp"

    b = get_vol_render_opt("exp", False, ngp=False)
    assert b.model.freeze_renderer is True
    assert b.rendering.type == "sdf"
    assert b.training.size == 256
    # stage A's mutations must not leak into stage B
    assert b.rendering.no_features_output is False


def test_rendering_overrides_plumb_to_hash_grid():
    """A yaml ``rendering:`` section must reach the HashGridSpec the NGP
    renderer builds (the TPU-tuned grid in ffhq_256_sdf_ngp_tpu.yaml
    depends on this path end-to-end)."""
    from sdface_gan_tpu.config.build import generator_config
    from sdface_gan_tpu.config.sdf_options import rendering_overrides

    cfg = {"rendering": {"num_levels": 8, "finest_res": 1024,
                         "log2_hashmap_size": 17}}
    opt = get_vol_render_opt("exp", True, ngp=True, size=64,
                             extra_argv=rendering_overrides(cfg))
    grid = generator_config(opt, stage_a=True).renderer.network_config().grid
    assert grid.num_levels == 8
    assert grid.log2_hashmap_size == 17

    # absent section -> reference defaults (sdf_model.py:1534-1545)
    opt0 = get_vol_render_opt("exp", True, ngp=True, size=64,
                              extra_argv=rendering_overrides({}))
    grid0 = generator_config(opt0, stage_a=True).renderer.network_config().grid
    assert grid0.num_levels == 16
    assert grid0.log2_hashmap_size == 19


def test_geometry_counter_knobs_plumb_from_shipped_yaml():
    """The stacked-counters yaml (the config that produced the verified-
    geometry run, docs/TRAINING_RUN.md) must reach the renderer and the
    train hparams: bg_mode/view_independent via the rendering section,
    sparsity/distortion lambdas via train_args."""
    from sdface_gan_tpu.config.build import generator_config, train_hparams
    from sdface_gan_tpu.config.sdf_options import rendering_overrides
    from sdface_gan_tpu.config.yaml_config import default_config_path

    for path, want in [
        ("configs/64res/synthetic_64_sdf_solid.yaml",
         dict(bg="gray", vi=True, sparsity=0.1, dist=0.0)),
        ("configs/64res/synthetic_64_sdf_solid_dist.yaml",
         dict(bg="gray", vi=True, sparsity=0.01, dist=0.1)),
    ]:
        cfg = load_config(os.path.join(os.path.dirname(__file__), "..", path),
                          default_config_path())
        opt = get_vol_render_opt("exp", True, size=64,
                                 extra_argv=rendering_overrides(cfg))
        rcfg = generator_config(opt, stage_a=True).renderer
        assert rcfg.bg_mode == want["bg"], path
        assert rcfg.view_independent is want["vi"], path
        hp = train_hparams(opt)
        assert hp.sparsity_lambda == want["sparsity"], path
        assert hp.distortion_lambda == want["dist"], path
        assert hp.r1 == 100.0, path


def test_rendering_overrides_reject_unknown_keys():
    """parse_sdf_options drops unknown flags silently (parse_known_args),
    so the yaml bridge must reject typo'd keys loudly — a dropped
    sparsity_lambda would collapse training into the fog regime with
    nothing in the logs — while still skipping the GIRAFFE-family
    rendering keys every config inherits from configs/default.yaml."""
    from sdface_gan_tpu.config.sdf_options import rendering_overrides

    ok = rendering_overrides(
        ConfigNode(rendering={"render_program": "rotation_camera",
                              "render_dir": "x", "N_samples": 24})
    )
    assert ok == ["--N_samples", "24"]
    with pytest.raises(ValueError, match="sparsity_lamda"):
        rendering_overrides(ConfigNode(train_args={"sparsity_lamda": 0.1}))
    with pytest.raises(ValueError, match="view_independant"):
        rendering_overrides(ConfigNode(rendering={"view_independant": True}))


def test_select_like_names_missing_subtree(tmp_path):
    """Restoring a template whose keys the checkpoint lacks (e.g. a stage-B
    tree from a stage-A checkpoint) must say WHICH subtree is missing, not
    raise a bare KeyError('decoder')."""
    import jax.numpy as jnp

    from sdface_gan_tpu.utils.checkpoints import load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path), "models_0000001",
                    {"g": {"renderer": jnp.zeros((2,))}, "step": 1})
    with pytest.raises(KeyError, match="g/decoder"):
        load_checkpoint(str(tmp_path), "models_0000001",
                        {"g": {"renderer": jnp.zeros((2,)),
                               "decoder": jnp.zeros((2,))}, "step": 0})


def test_resolve_renderer_type_yaml_vs_flag():
    """rendering.type is yaml-settable (VERDICT r4 / ADVICE r4: the --ngp
    flag alone selected the architecture, so a config inheriting NGP grid
    knobs silently trained SIREN — the accidental rerun).  Yaml 'ngp'
    selects NGP without the flag; yaml 'sdf' + --ngp 1 raises instead of
    producing a param-tree mismatch; absent yaml keeps reference
    flag-driven behavior (training_utils.py:189)."""
    from sdface_gan_tpu.config.sdf_options import (
        rendering_overrides,
        resolve_renderer_type,
    )

    assert resolve_renderer_type(ConfigNode(), False) is False
    assert resolve_renderer_type(ConfigNode(), True) is True
    ngp_cfg = ConfigNode(rendering={"type": "ngp", "num_levels": 4})
    assert resolve_renderer_type(ngp_cfg, False) is True
    assert resolve_renderer_type(ngp_cfg, True) is True
    sdf_cfg = ConfigNode(rendering={"type": "sdf", "num_levels": 4})
    assert resolve_renderer_type(sdf_cfg, False) is False
    with pytest.raises(ValueError, match="type: sdf"):
        resolve_renderer_type(sdf_cfg, True)
    with pytest.raises(ValueError, match="rendering.type"):
        resolve_renderer_type(ConfigNode(rendering={"type": "nerf"}), False)
    # the type key is consumed here, not flattened into CLI flags
    assert rendering_overrides(ngp_cfg) == ["--num_levels", "4"]


def test_shipped_ngp_configs_pin_type():
    """The TPU/synthetic NGP configs self-select the architecture; the
    SIREN-checkpoint handle pins type sdf over its inherited NGP knobs."""
    from sdface_gan_tpu.config import load_config
    from sdface_gan_tpu.config.sdf_options import resolve_renderer_type

    for f in ("configs/64res/synthetic_64_sdf_ngp_eik.yaml",
              "configs/256res/ffhq_256_sdf_ngp_tpu.yaml"):
        assert resolve_renderer_type(load_config(f), False) is True
    fresh = load_config("configs/64res/synthetic_64_sdf_eik_fresh.yaml")
    assert resolve_renderer_type(fresh, False) is False
    with pytest.raises(ValueError):
        resolve_renderer_type(fresh, True)


def test_compile_cache_host_keyed(tmp_path, monkeypatch):
    """host_keyed=True isolates cache dirs by CPU-feature hash (VERDICT r4
    weak #4: foreign AOT code from a different host can SIGILL; a
    mismatched host must fall back to a cold compile in its own subdir)."""
    import jax

    from sdface_gan_tpu.utils import compile_cache as cc

    tag = cc.host_cpu_feature_tag()
    assert tag and len(tag) in (12, len("nocpuinfo"))
    assert tag == cc.host_cpu_feature_tag()  # stable within a host

    base = tmp_path / "cache"
    cc.enable_compilation_cache(str(base), host_keyed=True)
    try:
        assert (base / tag).is_dir()
        assert jax.config.jax_compilation_cache_dir == str(base / tag)
        cc.enable_compilation_cache(str(base))  # unkeyed: the root dir
        assert jax.config.jax_compilation_cache_dir == str(base)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
