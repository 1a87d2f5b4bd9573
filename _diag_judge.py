import json, time, collections
import numpy as np
import jax, jax.numpy as jnp
from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.system import Engine
from dialog_tpu.frontend import extract_features_batch

cfg = EngineConfig(width=640, height=480, n_features=1000, max_features=1024,
    max_keyframes=256, max_landmarks=16384, max_local_lms=2048,
    max_local_kfs=16, max_fixed_kfs=16, max_obs_per_lm=8,
    local_ba_iters=5, max_frames_between_kf=30)
n_frames = 264
scene = synth.make_scene(seed=3, n_points=2500, n_frames=n_frames, cfg=cfg)
images = [jax.block_until_ready(jnp.asarray(synth.render_image(scene, i))) for i in range(n_frames)]

# time the frontend alone
B = 8
fb = extract_features_batch(jnp.stack(images[0:B]), cfg)
jax.block_until_ready(fb.uv)
t0 = time.perf_counter()
for k in range(5):
    fb = extract_features_batch(jnp.stack(images[k*8:k*8+B]), cfg)
    jax.block_until_ready(fb.uv)
print("extract_features_batch B=8:", (time.perf_counter()-t0)/5*1000, "ms")

eng = Engine(cfg)
def run_batch(i, occlude=False):
    batch = extract_features_batch(jnp.stack(images[i:i+B]), cfg)
    if occlude:
        batch = batch._replace(valid=batch.valid.at[:B//2].set(False))
    eng.track_batch(batch, [float(i+j)/30.0 for j in range(B)])

warm_end = 104
for i in range(8):
    eng.track_image(images[i], float(i)/30.0)
for i in range(8, warm_end, B):
    run_batch(i, occlude=(i==48))
eng.flush()
if eng._vocab is not None:
    eng._loop.dispatch(eng.m, eng._bow_db, eng._vocab, max(eng.kf_count-1,0))
    det = eng._loop.take_pending()
    if det is not None:
        eng._loop.evaluate(det[0], np.asarray(det[1]), det[2])
while eng.frame_id < warm_end + 2*B and eng.state != "OK":
    i = eng.frame_id
    eng.track_features(jax.tree_util.tree_map(lambda x: x[0],
        extract_features_batch(jnp.stack(images[i:i+1]), cfg)), float(i)/30.0)

print("state before timed:", eng.state, "frame_id:", eng.frame_id, "kfs:", eng.kf_count)
start = ((eng.frame_id + B - 1)//B)*B
times = []
states = collections.Counter()
for i in range(start, n_frames - B + 1, B):
    t1 = time.perf_counter()
    run_batch(i)
    times.append(time.perf_counter()-t1)
    states[eng.state] += 1
eng.flush()
jax.block_until_ready(eng.m.kfs.R)
print("per-batch times (ms):", [round(t*1000,1) for t in times])
print("states during timed:", dict(states), "final kfs:", eng.kf_count)
st = collections.Counter(r.state for r in eng.trajectory)
print("trajectory states:", dict(st))
