"""Model families: NBFM (reference parity), WBFM broadcast, channel bank."""
from .nbfm import BlockPipeline, PipelineState
from .wbfm import WbfmConfig, WbfmPipeline, WbfmState
from .channel_bank import (ChannelBankConfig, ChannelBankPipeline,
                           ChannelBankState)

__all__ = [
    "BlockPipeline", "PipelineState",
    "WbfmConfig", "WbfmPipeline", "WbfmState",
    "ChannelBankConfig", "ChannelBankPipeline", "ChannelBankState",
]
