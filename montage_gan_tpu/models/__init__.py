from .layers import FullyConnected, Conv2dLayer, MinibatchStd, normalize_2nd_moment
from .mapping import MappingNetwork, GlobalMappingNetwork
from .synthesis import SynthesisLayer, ToRGBLayer, SynthesisBlock, SynthesisNetwork, Generator
from .discriminator import DiscriminatorBlock, DiscriminatorEpilogue, Discriminator
from .stn import STN
from .renderer import RendererTanh, RendererSigmoid, RendererSubPixelConv, build_renderer
