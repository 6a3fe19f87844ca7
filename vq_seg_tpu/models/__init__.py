from vq_seg_tpu.models.networks import make_model, network_dict  # noqa: F401
