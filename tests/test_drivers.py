"""End-to-end driver tests: invoke the real CLI mains in-process (CPU backend
via conftest) on the tiny config + synthetic data."""
import sys

import numpy as np
import pytest


def _run(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [f"{module.__name__}.py"] + argv)
    module.main()


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "run")


def test_train_driver_smoke(workdir, monkeypatch):
    import train
    _run(train, ["--py-config", "tiny", "--work-dir", workdir,
                 "--synthetic", "--max-steps", "2", "--print-freq", "1"],
         monkeypatch)
    import os
    assert os.path.isdir(os.path.join(workdir, "ckpts"))
    assert os.path.exists(os.path.join(workdir, "scalars.jsonl"))


def test_train_resume(workdir, monkeypatch):
    import train
    _run(train, ["--py-config", "tiny", "--work-dir", workdir,
                 "--synthetic", "--max-steps", "1"], monkeypatch)
    # resumes from the saved checkpoint without error
    _run(train, ["--py-config", "tiny", "--work-dir", workdir,
                 "--synthetic", "--max-steps", "1"], monkeypatch)


def test_eval_depth_driver(workdir, monkeypatch, capsys):
    import eval_depth
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir,
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--no-shard"], monkeypatch)


def test_eval_iou_driver(workdir, monkeypatch):
    import eval_iou
    _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0"], monkeypatch)


def test_eval_novel_depth_driver(workdir, monkeypatch):
    import eval_novel_depth
    _run(eval_novel_depth, ["--py-config", "tiny", "--work-dir", workdir,
                            "--synthetic", "--num-samples", "1",
                            "--batch", "64", "--offsets", "1.0"], monkeypatch)


def test_eval_novel_depth_max_target(workdir, monkeypatch):
    """--depth-tgt max: scores the argmax-weight render in the novel-view
    loop (reference eval_novel_depth.py:70,174-177), forcing
    return_max_depth when the config omits it."""
    import eval_novel_depth
    _run(eval_novel_depth, ["--py-config", "tiny", "--work-dir", workdir,
                            "--synthetic", "--num-samples", "1",
                            "--batch", "64", "--offsets", "1.0",
                            "--depth-tgt", "max"], monkeypatch)


def test_eval_depth_max_target(workdir, monkeypatch, tmp_path):
    """--depth-metric-tgt max: scores the argmax-weight depth render
    (reference eval_depth.py:215-220 / neus_head.py:579-587) even when the
    config doesn't set return_max_depth; median tgt is rejected (dead code
    upstream); raw still the default."""
    import os
    import eval_depth
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir,
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--no-shard", "--depth-metric-tgt", "max",
                      "--save-depth"], monkeypatch)
    # the max render is saved alongside the raw one and differs from it
    raw = np.load(os.path.join(workdir, "depth_0000.npy"))
    mx = np.load(os.path.join(workdir, "depth_max_0000.npy"))
    assert raw.shape == mx.shape
    assert np.isfinite(mx).all()
    assert np.abs(raw - mx).max() > 0
    with pytest.raises(SystemExit, match="median"):
        _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir,
                          "--synthetic", "--num-samples", "1",
                          "--depth-metric-tgt", "median"], monkeypatch)


def test_eval_depth_flip_tta(workdir, monkeypatch):
    import eval_depth
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir,
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--no-shard", "--flip"], monkeypatch)


def test_vis_pics_driver(workdir, monkeypatch, tmp_path):
    import os
    import vis_pics
    _run(vis_pics, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1", "--batch", "64"],
         monkeypatch)
    assert any(f.endswith(".png") for f in os.listdir(workdir))


def test_vis_3d_driver(workdir, monkeypatch):
    import os
    import vis_3d
    _run(vis_3d, ["--py-config", "tiny", "--work-dir", workdir,
                  "--synthetic", "--num-samples", "1",
                  "--resolution", "1.0"], monkeypatch)
    files = os.listdir(workdir)
    assert any(f.endswith((".ply", ".npy")) for f in files), files


def test_vis_3d_gt_export(workdir, monkeypatch):
    """--gt (reference vis_3d.py mode 2): GT voxels exported as npy+ply
    beside the predictions — synthetic procedural-grid branch."""
    import os
    import vis_3d
    _run(vis_3d, ["--py-config", "tiny", "--work-dir", workdir,
                  "--synthetic", "--num-samples", "1",
                  "--resolution", "1.0", "--gt"], monkeypatch)
    assert os.path.exists(os.path.join(workdir, "gt_000.npy"))
    assert os.path.exists(os.path.join(workdir, "gt_000.ply"))


def test_vis_3d_gt_export_occ3d(workdir, monkeypatch, tmp_path):
    """--gt on a fabricated real-layout Occ3D label tree: the 200x200x16
    semantics grid is exported with the nuScenes palette."""
    import os
    import vis_3d
    _mini_real_cfg(monkeypatch, tmp_path, "tiny_real_v", with_lidar=True,
                   with_occ3d=True)
    _run(vis_3d, ["--py-config", "tiny_real_v", "--work-dir", workdir,
                  "--num-samples", "1", "--resolution", "1.0", "--gt"],
         monkeypatch)
    gt = np.load(os.path.join(workdir, "gt_000.npy"))
    assert gt.shape == (200, 200, 16)
    assert os.path.exists(os.path.join(workdir, "gt_000.ply"))


def test_generate_videos_driver(tmp_path, monkeypatch):
    import numpy as np
    import generate_videos
    src = tmp_path / "pics"
    src.mkdir()
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 not available")
    for idx in range(2):
        for cam in range(2):
            img = (np.random.rand(32, 48, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(src / f"depth_{idx:03d}_cam{cam}.png"), img)
    out = tmp_path / "demo.mp4"
    _run(generate_videos, ["--src-dir", str(src), "--out", str(out),
                           "--num-cams", "2", "--fps", "2"], monkeypatch)
    assert out.exists() and out.stat().st_size > 0


def test_eval_iou_occ3d_path(workdir, monkeypatch):
    """Occ3D branch end-to-end on synthetic GT: ego-grid resample + masked
    binary IoU (reference eval_iou.py:210-250)."""
    import eval_iou
    _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0", "--occ3d", "--use-mask"],
         monkeypatch)


def test_eval_iou_occ3d_sem_path(workdir, monkeypatch):
    """Occ3D + --sem: logits resampled into the ego grid, argmax'd,
    class-space-remapped and mIoU-scored (reference eval_iou.py:240-250)."""
    import eval_iou
    _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0", "--occ3d", "--use-mask", "--sem",
                    "--save-sem", workdir], monkeypatch)
    import os
    assert any("labels.npz" in fs for _, _, f in os.walk(workdir)
               for fs in f)


def test_eval_iou_torch_ckpt_roundtrip(workdir, monkeypatch, tmp_path):
    """North-star acceptance gate (VERDICT #2): synthesize a FULL
    reference-layout .pth (encoder + neck + lifter + field MLP + deviation),
    import it via --torch-ckpt, and run eval_iou occ3d end-to-end. Zero
    unmatched core keys is asserted inside (importer warns otherwise)."""
    import jax
    import torch
    import eval_iou
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.ref_import import convert_reference_state_dict
    from test_ref_import import _ref_keys_from_ours
    from utils_tiny import make_cameras

    cfg = get_config("tiny")
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(1)},
        imgs, cams["lidar2img"], cams["img2lidar"], rng, 0, True))()

    sd = _ref_keys_from_ours(variables["params"],
                             cfg.model.encoder.num_layers)
    _, _, unmatched = convert_reference_state_dict(sd)
    assert unmatched == []
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": sd}, pth)

    _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0", "--occ3d", "--use-mask",
                    "--torch-ckpt", pth], monkeypatch)


def test_parity_rehearsal_smoke(workdir, monkeypatch, tmp_path):
    """tools/parity_rehearsal.py end to end on a fabricated reference .pth
    (VERDICT r3 #8): import -> export/re-import round-trip gate ->
    eval_depth -> eval_iou, one command."""
    import jax
    import torch
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from test_ref_import import _ref_keys_from_ours
    from utils_tiny import make_cameras

    cfg = get_config("tiny")
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(1)},
        imgs, cams["lidar2img"], cams["img2lidar"], rng, 0, True))()
    sd = _ref_keys_from_ours(variables["params"],
                             cfg.model.encoder.num_layers)
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": sd}, pth)

    sys.path.insert(0, "tools")
    import parity_rehearsal
    parity_rehearsal.main([
        "--py-config", "tiny", "--torch-ckpt", pth, "--work-dir", workdir,
        "--synthetic", "--num-samples", "1", "--resolution", "1.0",
        "--batch", "64", "--no-shard"])
    import os
    assert os.path.exists(os.path.join(workdir, "reexport.pth"))


def test_eval_iou_openoccupancy_path(workdir, monkeypatch, tmp_path):
    """OpenOccupancy branch: sparse .npy voxel labels + fixed z/lateral
    crops on the native uniform grid (reference eval_iou.py:251-263)."""
    import numpy as np
    import eval_iou
    import train as train_mod

    # synthesize a sparse label file: rows (c0, c1, c2) -> gt[c1, c2, c0];
    # the label frame is declared via --openocc-grid (fixed 512x512x40 on
    # real data; here sized to the OPENOCC_PCR grid at resolution 1.0,
    # 102x102x8)
    label = np.stack([np.random.randint(0, 8, 40),
                      np.random.randint(0, 102, 40),
                      np.random.randint(0, 102, 40)], 1).astype(np.int64)
    path = str(tmp_path / "occupancy.npy")
    np.save(path, label)

    real_loader = train_mod.get_dataloader

    class _Inject:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            item = dict(self.ds[i])
            item["openocc_label_path"] = path
            return item

    monkeypatch.setattr(train_mod, "get_dataloader",
                        lambda cfg, syn, phase="train": _Inject(real_loader(cfg, syn, phase)))
    _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0",
                    "--openocc-grid", "102", "102", "8"], monkeypatch)
    # a mismatched label frame must error loudly, never silently drop GT
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="prediction grid"):
        _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                        "--synthetic", "--num-samples", "1",
                        "--resolution", "1.0"], monkeypatch)


def test_eval_iou_openoccupancy_sem_miou(workdir, monkeypatch, tmp_path):
    """4-column OpenOccupancy labels score semantic mIoU against the class
    column scattered into the fixed frame (our fix of the reference's
    broken coordinates-as-labels sem path, eval_iou.py:41,266-270)."""
    import numpy as np
    import eval_iou
    import train as train_mod

    label = np.stack([np.random.randint(0, 8, 40),
                      np.random.randint(0, 102, 40),
                      np.random.randint(0, 102, 40),
                      np.random.randint(1, 17, 40)], 1).astype(np.int64)
    path = str(tmp_path / "occupancy_sem.npy")
    np.save(path, label)

    real_loader = train_mod.get_dataloader

    class _Inject:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            item = dict(self.ds[i])
            item["openocc_label_path"] = path
            return item

    monkeypatch.setattr(train_mod, "get_dataloader",
                        lambda cfg, syn, phase="train": _Inject(real_loader(cfg, syn, phase)))
    _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0", "--sem",
                    "--openocc-grid", "102", "102", "8"], monkeypatch)


def test_eval_iou_density_nerfacc(workdir, monkeypatch):
    """NeRFAccHead density pipeline through eval_iou --density (reference
    nerfacc_head.py density field; VERDICT r1 item 9 wiring)."""
    import eval_iou
    _run(eval_iou, ["--py-config", "tiny_nerfacc", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0", "--density", "--thresh", "0.5"],
         monkeypatch)


def test_train_step_nerfacc(workdir, monkeypatch):
    """One training step on the density head (reproj+rgb+sem losses, no SDF
    regularizers)."""
    import train
    _run(train, ["--py-config", "tiny_nerfacc", "--work-dir", workdir,
                 "--synthetic", "--max-steps", "1", "--print-freq", "1"],
         monkeypatch)


def test_vis_3d_scene_scene_walk(workdir, monkeypatch, tmp_path):
    """Scene-walk vis dataset (reference *_vis variants): nuScenes_Scene_Vis
    + VisDatasetWrapper through the real vis_3d_scene CLI."""
    from test_nuscenes_dataset import _make_mini_nuscenes
    import vis_3d_scene
    import os
    data_path, pkl, _ = _make_mini_nuscenes(tmp_path)
    _run(vis_3d_scene, ["--py-config", "tiny", "--work-dir", workdir,
                        "--imageset", pkl, "--data-path", data_path,
                        "--num-samples", "2", "--resolution", "1.0"],
         monkeypatch)
    assert os.path.exists(os.path.join(workdir, "scene.ply"))


def test_bench_frame_json(workdir, monkeypatch, capsys):
    """bench.py --frame emits exactly one parseable JSON line (the driver
    records this output every round)."""
    import json
    import bench
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--frame", "tiny", "--rays", "4", "6",
                         "--chunk", "16"])
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    rec = json.loads(line)
    assert rec["metric"] == "eval_frame_seconds"
    assert rec["value"] > 0 and rec["prepare_s"] > 0 and rec["render_s"] > 0


def test_train_prefetch_matches_synchronous(workdir, monkeypatch, tmp_path):
    """The prefetch worker (reference DataLoader num_workers analog) changes
    only WHEN batches are built, never their content: same seed => identical
    logged losses with --prefetch 0 and 2."""
    import json
    import train

    def losses(wd, prefetch):
        _run(train, ["--py-config", "tiny", "--work-dir", wd,
                     "--synthetic", "--max-steps", "2", "--print-freq", "1",
                     "--prefetch", str(prefetch)], monkeypatch)
        with open(f"{wd}/scalars.jsonl") as f:
            return [json.loads(l) for l in f if '"loss/total"' in l]

    a = losses(str(tmp_path / "sync"), 0)
    b = losses(str(tmp_path / "pre"), 2)
    assert len(a) == len(b) == 2
    for ra, rb in zip(a, b):
        assert abs(ra["value"] - rb["value"]) < 1e-6, (ra, rb)


def test_drivers_tolerate_host_only_batch_entries(workdir, monkeypatch):
    """Real datasets put strings ('token', label paths) in every batch
    (nuscenes_dataset.py:308-312); drivers must filter them, not
    jnp.asarray-crash (round-2 review finding)."""
    import eval_depth
    import train as train_mod

    real_loader = train_mod.get_dataloader

    class _Tok:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            item = dict(self.ds[i])
            item["token"] = f"tok{i}"
            return item

    monkeypatch.setattr(train_mod, "get_dataloader",
                        lambda cfg, syn, phase="train": _Tok(real_loader(cfg, syn, phase)))
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir,
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--no-shard"], monkeypatch)


def test_eval_depth_sharded_matches_unsharded(workdir, monkeypatch):
    """The sharded ChunkedRenderer path users actually run (no --no-shard)
    produces the SAME depth as the unsharded one on the 8-device CPU mesh
    (VERDICT r2 weak #4: sharded eval was never driver-tested)."""
    import os
    import eval_depth
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir + "_sh",
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--save-depth"], monkeypatch)
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir + "_ns",
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--no-shard", "--save-depth"], monkeypatch)
    # camera-sharded prepare (model parallelism) — same numbers again
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir + "_ps",
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--prepare-shard", "--save-depth"], monkeypatch)
    d_sh = np.load(os.path.join(workdir + "_sh", "depth_0000.npy"))
    d_ns = np.load(os.path.join(workdir + "_ns", "depth_0000.npy"))
    d_ps = np.load(os.path.join(workdir + "_ps", "depth_0000.npy"))
    assert d_sh.shape == d_ns.shape
    np.testing.assert_allclose(d_sh, d_ns, atol=1e-5)
    np.testing.assert_allclose(d_ps, d_ns, atol=1e-5)


def test_eval_iou_kitti_driver(workdir, monkeypatch):
    """eval_iou_kitti end-to-end: forward_occ on the fixed front-only KITTI
    AABB, reference post-crops, IoU + SSCMetrics (synthetic GT fallback)."""
    import eval_iou_kitti
    _run(eval_iou_kitti, ["--py-config", "tiny", "--work-dir", workdir,
                          "--synthetic", "--num-samples", "1",
                          "--resolution", "1.0"], monkeypatch)


def _mini_real_cfg(monkeypatch, tmp_path, name, **fab_kw):
    """Fabricate an on-disk nuScenes-format mini dataset and register a
    6-camera tiny config pointed at it under ``name``."""
    import dataclasses

    import selfocc_tpu.configs.experiments as E
    from test_nuscenes_dataset import _make_mini_nuscenes

    data_path, pkl, label_roots = _make_mini_nuscenes(tmp_path, **fab_kw)
    base = E.get_config("tiny")
    ds_args = dict(data_path=data_path, imageset=pkl, min_dist=0.4,
                   max_dist=5.0, strict=True, cur_prob=0.5,
                   composite_prev_next=True, sensor_mus=[0.5, 0.5],
                   sensor_sigma=0.5, ego_centric=True, **label_roots)
    cfg = dataclasses.replace(
        base, name=name, sem=False, num_cams=6,
        # the fabricated rig has the full 6-camera surround
        model=dataclasses.replace(
            base.model,
            encoder=dataclasses.replace(base.model.encoder, num_cams=6)),
        loss_cfgs=[l for l in base.loss_cfgs if l["type"] != "SemCELossMS"],
        loss_input_convertion={k: v for k, v in
                               base.loss_input_convertion.items()
                               if k != "sem"},
        train_dataset_args=ds_args, val_dataset_args=dict(ds_args))
    monkeypatch.setitem(E._CONFIGS, name, lambda: cfg)
    return cfg


def test_train_driver_real_format_nuscenes(workdir, monkeypatch, tmp_path):
    """train.py WITHOUT --synthetic on a fabricated on-disk nuScenes-format
    dataset — a driver-level exercise of the real-data CLI path
    (pkl loading -> build_dataset factory -> wrapper train-aug pipeline ->
    train step)."""
    import os

    _mini_real_cfg(monkeypatch, tmp_path, "tiny_real")
    import train
    _run(train, ["--py-config", "tiny_real", "--work-dir", workdir,
                 "--max-steps", "2", "--print-freq", "1"], monkeypatch)
    assert os.path.isdir(os.path.join(workdir, "ckpts"))
    assert os.path.exists(os.path.join(workdir, "scalars.jsonl"))


def test_eval_depth_driver_real_format(workdir, monkeypatch, tmp_path):
    """eval_depth WITHOUT --synthetic: val split through the val pipeline,
    with EVAL_OVERRIDES' return_depth=True projecting a real on-disk lidar
    sweep (samples/*.bin) into the cameras for sparse depth GT — the full
    real-data metric path (reference eval_depth.py + metric_util.py)."""
    _mini_real_cfg(monkeypatch, tmp_path, "tiny_real_d", with_lidar=True)
    import eval_depth
    _run(eval_depth, ["--py-config", "tiny_real_d", "--work-dir", workdir,
                      "--num-samples", "1", "--batch", "64", "--no-shard"],
         monkeypatch)


def test_eval_iou_driver_real_format_occ3d(workdir, monkeypatch, tmp_path):
    """eval_iou --occ3d WITHOUT --synthetic: reads a fabricated real-layout
    Occ3D label tree (gts/<scene>/<token>/labels.npz with semantics /
    mask_camera / mask_lidar) through the dataset's occ3d_root resolution —
    the real-labels path CLAUDE.md lists as previously unexercised."""
    _mini_real_cfg(monkeypatch, tmp_path, "tiny_real_o", with_lidar=True,
                   with_occ3d=True)
    import eval_iou
    _run(eval_iou, ["--py-config", "tiny_real_o", "--work-dir", workdir,
                    "--num-samples", "1", "--resolution", "1.0", "--occ3d",
                    "--use-mask"], monkeypatch)


def _mini_kitti_cfg(monkeypatch, tmp_path, name, **fab_kw):
    """Fabricate an on-disk SemanticKITTI-format tree and register a
    single-camera tiny config pointed at it under ``name``."""
    import dataclasses

    import selfocc_tpu.configs.experiments as E
    from test_kitti_dataset import _make_mini_kitti

    root = _make_mini_kitti(tmp_path, img_hw=(64, 96), **fab_kw)
    base = E.get_config("tiny")
    ds_args = dict(data_path=root, sequences=["00"], frames_interval=0.4,
                   sequence_distance=4, cur_prob=0.5, choose_nearest=True)
    cfg = dataclasses.replace(
        base, name=name, sem=False, num_cams=1,
        dataset_type="Kitti_One_Frame",
        model=dataclasses.replace(
            base.model,
            encoder=dataclasses.replace(base.model.encoder, num_cams=1)),
        loss_cfgs=[l for l in base.loss_cfgs if l["type"] != "SemCELossMS"],
        loss_input_convertion={k: v for k, v in
                               base.loss_input_convertion.items()
                               if k != "sem"},
        train_dataset_args=dict(ds_args, split="train"),
        val_dataset_args=dict(ds_args, split="val"))
    monkeypatch.setitem(E._CONFIGS, name, lambda: cfg)
    return root, cfg


def test_train_driver_real_format_kitti(workdir, monkeypatch, tmp_path):
    """train.py WITHOUT --synthetic over a fabricated on-disk
    SemanticKITTI-odometry tree (poses/calib/image_2/velodyne) through the
    Kitti_One_Frame factory branch."""
    import os

    _mini_kitti_cfg(monkeypatch, tmp_path, "tiny_kitti_real")
    import train
    _run(train, ["--py-config", "tiny_kitti_real", "--work-dir", workdir,
                 "--max-steps", "2", "--print-freq", "1"], monkeypatch)
    assert os.path.exists(os.path.join(workdir, "scalars.jsonl"))


def test_eval_iou_kitti_driver_real_format(workdir, monkeypatch, tmp_path):
    """eval_iou_kitti WITHOUT --synthetic: val split indexed by the voxels/
    completion GT, label path resolved from the batch's sequence+token
    (the wrapper must pass 'sequence' through — a real-data bug this test
    pins), .label/.invalid pair read + remapped + flipped, SSCMetrics and
    IoU scored on the 256x256x32 grid (reference eval_iou_kitti.py:24-42,
    160-190)."""
    root, _ = _mini_kitti_cfg(monkeypatch, tmp_path, "tiny_kitti_real_v",
                              with_voxels=True)
    import eval_iou_kitti
    _run(eval_iou_kitti, ["--py-config", "tiny_kitti_real_v",
                          "--work-dir", workdir, "--num-samples", "1",
                          "--resolution", "0.2", "--kitti-root", root],
         monkeypatch)


def test_eval_iou_driver_real_format_openocc(workdir, monkeypatch, tmp_path):
    """eval_iou (OpenOccupancy path) WITHOUT --synthetic: sparse voxel .npy
    labels resolved via scene token + LIDAR_TOP sample_data token
    (reference eval_iou.py:34-41), scattered to the fixed 512x512x40 grid."""
    _mini_real_cfg(monkeypatch, tmp_path, "tiny_real_oo", with_lidar=True,
                   with_openocc=True)
    import eval_iou
    _run(eval_iou, ["--py-config", "tiny_real_oo", "--work-dir", workdir,
                    "--num-samples", "1", "--resolution", "1.0",
                    "--openocc-grid", "102", "102", "8"], monkeypatch)
