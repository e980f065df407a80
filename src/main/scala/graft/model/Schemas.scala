package graft.model

import java.sql.Timestamp

/** Typed data model (SURVEY §1): case classes for the engine's core rows,
  * usable as `Dataset[T]` encoders where compile-time safety matters;
  * `DataFrame` stays the surface where schema is dynamic (CSV inference,
  * ad-hoc queries).
  */

/** §1 row 2: extracted per-document text (blob-free corpus). */
case class Doc(doc_id: Long, text: String, source: String)

/** §1 row 4: sectionized paragraph. */
case class SectionedParagraph(doc_id: Long, pos: Long, section: String, paragraph: String)

/** §1 row 5: chunk with section metadata (LangChain Document analog). */
case class Chunk(chunk_id: Long, doc_id: Long, section: String, text: String)

/** §1 row 7: one vector-index row (the "knowledge base" record). */
case class IndexedChunk(
    chunk_id: Long, doc_id: Long, section: String, text: String,
    embedding: Array[Float])

/** §1 row 8: one conversation-memory turn. */
case class SessionTurn(session_id: String, turn: Long, role: String, content: String)

/** §1 row 9: chat-log sink record (Mongo document analog). */
case class ChatLogRecord(user: String, message: String, response: String, ts: Timestamp)

/** §1 row 10: one OpenAI-style message. */
case class ChatMessage(role: String, content: String)

/** §1 row 11: usage/cost record (app.py:272-276 shape). */
case class UsageRecord(
    prompt_tokens: Long, completion_tokens: Long, total_tokens: Long, cost: Double)
