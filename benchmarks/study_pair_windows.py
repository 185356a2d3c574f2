from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np, jax.numpy as jnp
from particlesystemhybridcollisiondetection_tpu.geometry.scenes import bunny_scene
from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid
from particlesystemhybridcollisiondetection_tpu.core.step import make_sorted_episode_runner, _auto_window
from particlesystemhybridcollisiondetection_tpu.ops.grid import build_triangle_grid, morton_key, cell_index
from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import build_window_tables

scene = bunny_scene(width=480, height=270)
cfg = scene.config
grid, meta = build_triangle_grid(scene.triangles, cfg.grid)
w = _auto_window(None, meta)
tables = build_window_tables(grid, meta, w)
cells2 = np.asarray(tables.cells2)
run = make_sorted_episode_runner(scene.triangles, cfg, resort_every=8, cells_lookup="gather")
st = spawn_grid(cfg, layers_y=64)

for label, nsteps in (("settled", 620), ("rain", 1100)):
    st = run(st, nsteps - (620 if label=="rain" else 0))
    key0 = np.asarray(morton_key(st.pos, meta))
    order = np.argsort(key0, kind="stable")
    st7 = run(st, 7)
    pos_d = np.asarray(st7.pos)[:, order]
    cid = np.asarray(cell_index(jnp.asarray(pos_d), meta))
    start = cells2[0, cid].astype(np.int64); count = cells2[1, cid].astype(np.int64)
    R = len(cid)//128*128
    s = start[:R].reshape(-1,128); c = count[:R].reshape(-1,128)
    live = c > 0
    big = 1<<40
    ws_lo = np.where(live, s, big).min(1)
    ws_lo = np.where(ws_lo==big, 0, ws_lo)//128*128
    e = np.where(live, s+c, -1).max(1)
    ws_hi = np.maximum((e - w + 127)//128*128, 0)
    fits_lo = live & (s >= ws_lo[:,None]) & (s+c <= ws_lo[:,None]+w)
    fits_hi = live & (s >= ws_hi[:,None]) & (s+c <= ws_hi[:,None]+w)
    over1 = int((live & ~fits_lo).sum())
    over2 = int((live & ~fits_lo & ~fits_hi).sum())
    print(f"{label}: pair-window overflow lo-only={over1}  lo+hi={over2}  (rescued {over1-over2}, {100*(over1-over2)/max(over1,1):.1f}%)", flush=True)
