import torch.nn as nn
class ROIAlign(nn.Module):
    def __init__(self, *a, **k): super().__init__()
