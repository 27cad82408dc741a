import torch.nn as nn
def c2_msra_fill(m):
    nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
    if m.bias is not None: nn.init.constant_(m.bias, 0)
def c2_xavier_fill(m):
    nn.init.kaiming_uniform_(m.weight, a=1)
    if m.bias is not None: nn.init.constant_(m.bias, 0)
