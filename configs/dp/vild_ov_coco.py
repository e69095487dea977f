# ViLD baseline on OV-COCO (reference configs/dp/vild_ov_coco.py):
# object-head distillation only, no global/block branches.
_base_ = ['oadp_ov_coco.py']

model = dict(with_global=False, with_block=False)
