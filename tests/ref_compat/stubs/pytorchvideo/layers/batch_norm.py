import torch.nn as nn
NaiveSyncBatchNorm1d = nn.BatchNorm1d
NaiveSyncBatchNorm3d = nn.BatchNorm3d
