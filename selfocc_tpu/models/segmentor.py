"""TPVSegmentor — the end-to-end model orchestrator.

TPU-native rewrite of ``model/segmentor/tpv_segmentor.py`` +
``base_segmentor.py``: backbone -> neck -> lifter -> encoder -> head, as one
Flax module with explicit mode methods instead of boolean-flag dispatch
(reference ``tpv_segmentor.py:87-125``).

All camera matrices arrive as stacked arrays; images are NHWC.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.base import ModelConfig
from .encoder import TPVFormerEncoder
from .fpn import FPN
from .heads import NeuSHead
from .lifter import BEVQueryLifter, TPVPositionLifter, TPVQueryLifter
from .resnet import ResNet50


class TPVSegmentor(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if c.backbone_type == "tiny":
            from .resnet import TinyBackbone
            self.img_backbone = TinyBackbone(
                channels=tuple(c.fpn_in_channels), name="img_backbone")
        elif c.backbone_type == "unet2d":
            from .efficientnet import EfficientNetConfig
            from .unet2d import UNet2D
            self.img_backbone = UNet2D(
                out_feature=c.fpn_in_channels[0],
                encoder_cfg=EfficientNetConfig(
                    width_coefficient=c.unet_scaling[0],
                    depth_coefficient=c.unet_scaling[1]),
                name="img_backbone")
        else:
            bb_cls = ResNet50
            if c.remat_backbone:
                # recompute the backbone in the backward instead of keeping
                # its activations live across the whole encoder+render
                # backward (train argument is static: argnums count self=0)
                bb_cls = nn.remat(ResNet50, static_argnums=(2,))
            self.img_backbone = bb_cls(dtype=c.compute_dtype,
                                       name="img_backbone")
        if c.neck_type == "identity":
            from .fpn import IdentityNeck
            self.img_neck = IdentityNeck(name="img_neck")
        else:
            self.img_neck = FPN(
                in_channels=tuple(c.fpn_in_channels),
                out_channels=c.embed_dims, num_outs=len(c.fpn_in_channels),
                dtype=c.compute_dtype, name="img_neck")
        if c.lifter_type == "TPVQueryLifter":
            m = self._encoder_sizes()
            self.lifter = TPVQueryLifter(
                tpv_h=m[0], tpv_w=m[1], tpv_z=m[2], dim=c.embed_dims,
                name="lifter")
        elif c.lifter_type == "BEVQueryLifter":
            m = self._encoder_sizes()
            self.lifter = BEVQueryLifter(
                bev_h=m[0], bev_w=m[1], dim=c.embed_dims, name="lifter")
        elif c.lifter_type == "TPVPositionLifter":
            self.lifter = TPVPositionLifter(
                embed_dims=c.embed_dims, name="lifter", **c.lifter_args)
        else:
            raise ValueError(c.lifter_type)
        e = c.encoder
        if c.use_bev_encoder and e.camera_aware:
            raise ValueError("camera_aware is a TPVFormer module "
                             "(camera_se_net.py); the BEVFormer encoder "
                             "variant does not support it")
        if c.use_bev_encoder:
            from .encoder import BEVFormerEncoder
            self.encoder = BEVFormerEncoder(
                mapping_args=e.mapping_args, embed_dims=e.embed_dims,
                num_heads=e.num_heads, num_cams=e.num_cams,
                num_feature_levels=e.num_feature_levels,
                num_points_cross=min(e.num_points_cross),
                num_points_self=e.num_points_self, num_layers=e.num_layers,
                feedforward_channels=e.feedforward_channels,
                dropout=e.dropout, pos_num_freqs=tuple(e.pos_num_freqs),
                pc_range=tuple(e.pc_range),
                self_query_chunk=e.self_query_chunk,
                cross_query_chunk=e.cross_query_chunk,
                visible_capacity=e.cross_visible_capacity,
                attn_value_bf16=e.attn_value_bf16,
                msda_bundle=e.msda_bundle,
                msda_point_chunk=e.msda_point_chunk,
                remat_layers=e.remat_layers,
                name="encoder")
            h = c.head
            self._build_head(h)
            return
        self.encoder = TPVFormerEncoder(
            mapping_args=e.mapping_args, embed_dims=e.embed_dims,
            num_heads=e.num_heads, num_cams=e.num_cams,
            num_feature_levels=e.num_feature_levels,
            num_points_cross=tuple(e.num_points_cross),
            num_points_self=e.num_points_self, num_layers=e.num_layers,
            feedforward_channels=e.feedforward_channels, dropout=e.dropout,
            pos_num_freqs=tuple(e.pos_num_freqs),
            pc_range=tuple(e.pc_range),
            self_query_chunk=e.self_query_chunk,
            cross_query_chunk=e.cross_query_chunk,
            shared_locations=e.shared_locations,
            visible_capacity=e.cross_visible_capacity,
            attn_value_bf16=e.attn_value_bf16,
            msda_bundle=e.msda_bundle,
            msda_point_chunk=e.msda_point_chunk,
            msda_query_unroll=e.msda_query_unroll,
            remat_layers=e.remat_layers,
            multi_plane_ffn_norm=e.multi_plane_ffn_norm,
            camera_aware=e.camera_aware,
            camera_aware_mid_channels=e.camera_aware_mid_channels,
            name="encoder")
        self._build_head(c.head)

    def _build_head(self, h):
        if h.head_type == "nerfacc":
            from .density_head import NeRFAccHead
            self.head = NeRFAccHead(
                roi_aabb=tuple(h.roi_aabb), mapping_args=h.mapping_args,
                resolution=h.resolution, near_plane=h.near_plane,
                far_plane=h.far_plane, num_samples=h.num_samples,
                ray_sample_mode=h.ray_sample_mode,
                ray_number=tuple(h.ray_number),
                ray_img_size=tuple(h.ray_img_size),
                ray_upper_crop=h.ray_upper_crop,
                render_bkgd=h.render_bkgd,
                train_ray_chunk=h.train_ray_chunk,
                embed_dims=h.embed_dims, color_dims=h.color_dims,
                sem_dims=h.sem_dims, density_layers=h.density_layers,
                sh_deg=h.sh_deg, sh_act=h.sh_act, tpv=h.tpv,
                return_sem=h.return_sem, name="head")
            return
        if h.head_type != "neus":
            raise ValueError(f"unknown head_type {h.head_type!r}")
        self.head = NeuSHead(
            roi_aabb=tuple(h.roi_aabb), mapping_args=h.mapping_args,
            resolution=h.resolution, near_plane=h.near_plane,
            far_plane=h.far_plane, num_samples=h.num_samples,
            beta_init=h.beta_init, beta_max=h.beta_max,
            total_iters=h.total_iters, beta_hand_tune=h.beta_hand_tune,
            use_numerical_gradients=h.use_numerical_gradients,
            numerical_gradients_delta=h.numerical_gradients_delta,
            use_compact_2nd_grad=h.use_compact_2nd_grad,
            anneal_aabb=h.anneal_aabb,
            aabb_every_iters=h.aabb_every_iters,
            aabb_min_near=h.aabb_min_near,
            aabb_min_far_frac=h.aabb_min_far_frac,
            base_variance=h.base_variance,
            return_uniform_sdf=h.return_uniform_sdf,
            return_max_depth=h.return_max_depth,
            return_surface_sdf=h.return_surface_sdf,
            return_second_grad=h.return_second_grad,
            return_sample_sdf=h.return_sample_sdf,
            return_sem=h.return_sem,
            ray_sample_mode=h.ray_sample_mode,
            ray_number=tuple(h.ray_number),
            ray_img_size=tuple(h.ray_img_size),
            ray_upper_crop=h.ray_upper_crop,
            ray_x_dsr_max=h.ray_x_dsr_max, ray_y_dsr_max=h.ray_y_dsr_max,
            render_bkgd=h.render_bkgd, train_ray_chunk=h.train_ray_chunk,
            use_pallas_weights=h.use_pallas_weights,
            num_samples_importance=h.num_samples_importance,
            num_upsample_steps=h.num_upsample_steps,
            bundle_volume=h.bundle_volume,
            eval_skip_coarse=h.eval_skip_coarse,
            eval_skip_fine=h.eval_skip_fine,
            embed_dims=h.embed_dims,
            color_dims=h.color_dims, sem_dims=h.sem_dims,
            density_layers=h.density_layers, sh_deg=h.sh_deg,
            sh_act=h.sh_act, two_split=h.two_split, tpv=h.tpv,
            name="head")

    def _encoder_sizes(self):
        from ..geometry.mappings import make_mapping
        m = make_mapping(**self.cfg.encoder.mapping_args)
        return m.size_h, m.size_w, m.size_d

    # ------------------------------------------------------------------ parts
    def extract_img_feat(self, imgs, train: bool = False, flip: bool = False):
        """Backbone + neck (reference ``tpv_segmentor.py:36-69``).

        Args: imgs (B, N, H, W, 3) normalized NHWC.
        Returns: list of (B, N, h, w, C) per FPN level.
        """
        B, N, H, W, C3 = imgs.shape
        x = imgs.reshape(B * N, H, W, C3)
        feats = self.img_backbone(x, train)   # positional: remat static_argnums
        feats = [feats[i] for i in self.cfg.img_backbone_out_indices]
        if self.cfg.freeze_img_backbone:
            # the reference's requires_grad_(False) skips the backbone
            # backward entirely (tpv_segmentor.py:29-32); stop_gradient here
            # gives XLA the same dead-code win (BN stats still update)
            feats = [jax.lax.stop_gradient(f) for f in feats]
        feats = self.img_neck(feats)
        if self.cfg.freeze_img_neck and self.cfg.freeze_img_backbone:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        out = []
        for f in feats:
            # flip may be a traced bool (batch["flip"] under jit); the
            # reference flips features along W when metas['flip']
            # (tpv_segmentor.py:53-55)
            f = jnp.where(jnp.asarray(flip), f[:, :, ::-1], f)
            f = f.astype(jnp.float32)   # encoder embeds/projection are fp32
            out.append(f.reshape(B, N, *f.shape[1:]))
        return out

    def get_representation(self, imgs, lidar2img, train: bool = False,
                           flip: bool = False, focal_ratios_x=None,
                           focal_ratios_y=None, intrinsic=None, cam2ego=None):
        """backbone -> neck -> lifter -> encoder."""
        ms_img_feats = self.extract_img_feat(imgs, train=train, flip=flip)
        rep = self.lifter(ms_img_feats)["representation"]
        img_shape = (imgs.shape[2], imgs.shape[3])
        enc_kwargs = {}
        if self.cfg.encoder.camera_aware:
            enc_kwargs = dict(intrinsic=intrinsic, cam2ego=cam2ego)
        rep = self.encoder(rep, ms_img_feats, lidar2img, img_shape,
                           focal_ratios_x=focal_ratios_x,
                           focal_ratios_y=focal_ratios_y,
                           deterministic=not train,
                           **enc_kwargs)["representation"]
        return rep

    # ------------------------------------------------------------------ modes
    def __call__(self, imgs, lidar2img, img2lidar, rng=None,
                 global_iter=None, train: bool = True, flip: bool = False,
                 focal_ratios_x=None, focal_ratios_y=None,
                 intrinsic=None, cam2ego=None):
        """Training forward -> head render outputs (loss inputs)."""
        rep = self.get_representation(imgs, lidar2img, train=train, flip=flip,
                                      focal_ratios_x=focal_ratios_x,
                                      focal_ratios_y=focal_ratios_y,
                                      intrinsic=intrinsic, cam2ego=cam2ego)
        return self.head(rep, img2lidar, rng=rng, global_iter=global_iter,
                         train=train)

    def forward_occ(self, imgs, lidar2img, aabb=None, resolution=None,
                    flip: bool = False, intrinsic=None, cam2ego=None):
        """Occupancy eval (``occ_only=True`` path, ``tpv_segmentor.py:118``)."""
        rep = self.get_representation(imgs, lidar2img, train=False, flip=flip,
                                      intrinsic=intrinsic, cam2ego=cam2ego)
        return self.head.forward_occ(rep, aabb=aabb, resolution=resolution)

    def prepare(self, imgs, lidar2img, flip: bool = False, intrinsic=None,
                cam2ego=None):
        """Decode and cache the field volume (``prepare=True`` path)."""
        rep = self.get_representation(imgs, lidar2img, train=False, flip=flip,
                                      intrinsic=intrinsic, cam2ego=cam2ego)
        return self.head.prepare(rep)

    def occ_from_volume(self, volume, xyz):
        """Occupancy query against a prepared volume (grid-sharded eval —
        ``eval_lib.GridOccEvaluator``)."""
        return self.head.occ_from_volume(volume, xyz)

    def occ_uniform(self, volume, xs, ys, zs):
        """Separable-grid occupancy query against a prepared volume (the
        opt-in fast eval query — ``eval_iou --grid-query separable``)."""
        return self.head.occ_uniform(volume, xs, ys, zs)

    def render_rays(self, volume, origin, direction, geo_only=False):
        """Render a ray chunk against a prepared volume (eval-time chunked
        rendering, ``neus_head.py:308-471``). ``geo_only`` (static) gathers
        only the sdf/density channel — depth-eval fast path, see
        ``NeuSHead.render_rays``."""
        return self.head.render_rays(volume, origin, direction, train=False,
                                     geo_only=geo_only)
