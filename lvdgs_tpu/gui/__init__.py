from .gui_utils import GaussianPacket, HeadlessViewer
