from .engines import MatchingEngine, FGColorizeEngine, BGColorizeEngine, PIXEL_MU
from .session import ColorizationSession
from .factory import build_session
from . import compositing
