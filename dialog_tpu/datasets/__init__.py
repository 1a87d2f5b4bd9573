"""Dataset loaders and the synthetic-scene generator.

Reference equivalents: the per-dataset example drivers
(``Examples/Monocular/mono_tum.cc``, ``Examples/Stereo/stereo_kitti.cc``,
``Examples/RGB-D/rgbd_tum.cc`` + ``associate.py`` — SURVEY.md §2.1). The
synthetic generator has no reference equivalent; it supplies the ground-truth
fixtures the reference never had (SURVEY.md §4, §7.6).
"""
