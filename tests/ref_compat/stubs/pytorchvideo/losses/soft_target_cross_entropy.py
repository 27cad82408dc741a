import torch.nn as nn
class SoftTargetCrossEntropyLoss(nn.Module): pass
