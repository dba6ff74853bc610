from gmeta_tpu.meta.protonet import proto_loss_spt, proto_loss_qry, prototypes  # noqa: F401
from gmeta_tpu.meta.maml import MetaLearner, make_inner_loop  # noqa: F401
