import time, jax
import jax.numpy as jnp
from selfocc_tpu.utils.jax_cache import enable as ejc; ejc()
from selfocc_tpu.configs.experiments import get_config
from selfocc_tpu.models.segmentor import TPVSegmentor
from selfocc_tpu.data.synthetic import SyntheticDataset
from selfocc_tpu.utils.train_lib import jit_init_on_cpu

cfg = get_config('nuscenes_occ')
model = TPVSegmentor(cfg=cfg.model)
ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size, img_size=cfg.img_size, num_classes=21, length=1)
b = {k: jnp.asarray(v) for k, v in ds[0].items()}
rng = jax.random.PRNGKey(0)
variables = jit_init_on_cpu(lambda: model.init({'params': rng, 'dropout': rng}, b['imgs'], b['lidar2img'], b['temImg2lidar'], rng, 0, True))
prep = jax.jit(lambda v, i, l: model.apply(v, i, l, method='prepare'))
t0=time.time(); vol = prep(variables, b['imgs'], b['lidar2img']); s=float(vol.sum()); print('compile+1st prepare', round(time.time()-t0,1), 's')
for r in range(3):
    t0=time.time(); vol = prep(variables, b['imgs'], b['lidar2img']); s=float(vol.sum())
    print('prepare', round(time.time()-t0,2), 's')
