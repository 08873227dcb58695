from .webapp import QAWebApp, serve
